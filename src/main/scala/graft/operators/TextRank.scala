package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the classic
  * Robertson/Spärck-Jones ranking (the +1-smoothed IDF variant Lucene
  * uses, so IDF is never negative) as a declarative Spark job.
  *
  * Scale shape: the corpus explodes to (doc, term) rows but the filter to
  * query terms happens INSIDE the explode-select, so only matching-term
  * rows ever reach the (doc_id, term) aggregation — a corpus-size map
  * stage followed by shuffles proportional to matching rows, not corpus
  * tokens. Document-frequency and corpus stats are tiny aggregates that
  * attach by broadcast. Top-k is TakeOrderedAndProject (never a global
  * sort). No collect, no UDFs.
  */
object TextRank {

  /** Top-`k` documents for `queryTerms` by BM25, as
    * (rank, doc_id, n_terms_hit) ordered by score descending with doc id
    * breaking ties deterministically. Only documents containing at least
    * one query term are candidates (standard retrieval semantics). The
    * fractional score stays internal — ranks are stable integers.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val toks = docs.select(
      col(idCol),
      GraftText.whitespaceTokens(col(textCol)).as("__tk"))
    val base = toks.select(
      col(idCol),
      size(col("__tk")).cast("long").as("__dl"),
      explode(col("__tk")).as("__term"))
      .filter(col("__term").isInCollection(queryTerms))
    // per-(doc, term) term frequency, doc length riding along
    val tf = base.groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    // per-term document frequency — one skinny agg, broadcast back
    val df = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    // corpus stats: N docs, mean doc length (exact long sum / count)
    val stats = toks.agg(
      count(lit(1)).as("__n"),
      avg(size(col("__tk")).cast("long")).as("__avgdl"))
    val idf = log(
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
        + lit(1.0))
    val termScore = idf * (col("__tf") * (lit(k1) + 1)) /
      (col("__tf") + lit(k1) *
        (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val scored = tf
      .join(broadcast(df), "__term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(sum(termScore).as("__score"),
           count(lit(1)).as("n_terms_hit"))
    val top = scored
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(k)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__score").desc, col(idCol).asc)).cast("long"))
      .select(col("rank"), col(idCol), col("n_terms_hit"))
  }
}
