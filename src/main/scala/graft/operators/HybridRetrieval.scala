package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval with reciprocal-rank fusion —
  * the standard RAG serving recipe (Cormack/Clarke/Büttcher's RRF,
  * SIGIR 2009): each query runs BM25 over the token corpus AND exact
  * cosine over the embedding corpus, the two top-`kCand` candidate
  * lists are fused by `score = Σ_legs 1/(rrfK + rank)`, and the fused
  * top-`k` ships with both per-leg ranks attached so a caller can see
  * WHY a hit surfaced (lexical match, semantic match, or both).
  *
  * Scale shape — each leg is the already-audited retrieval kernel:
  *   - lexical: the corpus token stream filters to query terms INSIDE
  *     the explode-select (a broadcast semi-join against the distinct
  *     query-term set), so only matching-term rows shuffle; per-pair
  *     scores aggregate on (q_id, doc_id); document frequency and
  *     corpus stats are skinny broadcast aggregates — identical cost
  *     structure to [[TextRank.bm25TopK]], fanned out per query by a
  *     broadcast (q_id, term) join bounded by the minibatch size.
  *   - semantic: the query block broadcasts into a pure map over the
  *     embedding scan; `graft_topk`'s k-slot heap moves only `kCand`
  *     rows per query per partition — identical to
  *     [[GraftSimilarity.bruteForceTopK]] (swap in the IVF store's
  *     probe path at serving scale; fusion is rank-only so the fused
  *     contract is unchanged wherever the candidate lists come from).
  *   - fusion: both legs are capped at `kCand` rows per query BEFORE
  *     the full-outer rank join, so fusion touches ≤ 2·kCand rows per
  *     query REGARDLESS of corpus size — the window that assigns the
  *     fused rank sorts per-query lists of ≤ 2·kCand rows, never a
  *     corpus-sized partition.
  *
  * Determinism contract (the cross-engine stance of the whole catalog):
  * per-term BM25 addends quantize to a 1e-6 grid BEFORE the
  * order-insensitive integer sum; ranks are integers; the fused score
  * is an integer sum of two rank-derived integers on a 1e-9 grid — so
  * every emitted column is exactly replayable in SQL. Ties break on
  * doc id at every rank assignment.
  */
object HybridRetrieval {

  /** Fused top-`k` per query. `queries` carries one row per query:
    * (`qIdCol`, `qTermsCol`: array&lt;string&gt;, `qVecCol`:
    * array&lt;double&gt;) — a training/serving minibatch, small by
    * construction, broadcast into both legs. The query's own document
    * (same id) is excluded from both legs. Output:
    * (q_id, doc_id, rank, rrf, lex_rank, sem_rank) with a NULL leg rank
    * meaning the document surfaced on the other leg only.
    */
  def hybridTopK(docs: DataFrame, vecs: DataFrame, queries: DataFrame,
                 k: Int = 10, kCand: Int = 30, rrfK: Int = 60,
                 idCol: String = "doc_id", textCol: String = "text",
                 vecIdCol: String = "vec_id", vecCol: String = "v",
                 qIdCol: String = "q_id", qTermsCol: String = "q_terms",
                 qVecCol: String = "qv",
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"hybridTopK: k must be >= 1, got $k")
    require(kCand >= 1, s"hybridTopK: kCand must be >= 1, got $kCand")
    require(rrfK >= 1, s"hybridTopK: rrfK must be >= 1, got $rrfK")
    graft.GraftSession.ensureExtensions(docs.sparkSession)

    val q = queries.select(col(qIdCol).as("q_id"),
                           col(qTermsCol).as("__qtk"),
                           col(qVecCol).as("__qv"))

    // ---- lexical leg: multi-query BM25 ------------------------------
    // (q_id, term) pairs of the minibatch; the distinct term set gates
    // the corpus token stream so non-query terms never leave the map.
    val qTerms = q.select(col("q_id"),
                          explode(array_distinct(col("__qtk"))).as("__term"))
    val qTermSet = qTerms.select(col("__term")).distinct()

    val toks = docs.select(
      col(idCol).as("doc_id"),
      GraftText.whitespaceTokens(col(textCol)).as("__tk"))
    val termRows = toks
      .select(col("doc_id"), size(col("__tk")).cast("long").as("__dl"),
              explode(col("__tk")).as("__term"))
      .join(broadcast(qTermSet), "__term")
    // per-(doc, term) stats once — shared across queries hitting the term
    val tfDoc = termRows.groupBy(col("doc_id"), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val df = tfDoc.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val stats = toks.agg(
      count(lit(1)).as("__n"),
      avg(size(col("__tk")).cast("long")).as("__avgdl"))

    val idf = log(
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
        + lit(1.0))
    val termScore = idf * (col("__tf") * (lit(k1) + 1)) /
      (col("__tf") + lit(k1) *
        (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl")))
    // same integer-grid stance as bm25TopK: quantize each addend, then
    // an order-insensitive long sum per (query, document)
    val termScoreQ = round(termScore * lit(1e6), 0).cast("long")
    val lexScores = tfDoc
      .join(broadcast(df), "__term")
      .crossJoin(broadcast(stats))
      .join(broadcast(qTerms), "__term")
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(termScoreQ).as("__lex"))
    // per-query kCand cut via the mergeable heap (long scores < 2^53 are
    // exact as doubles); position in the heap output IS the rank
    val lex = lexScores
      .groupBy("q_id")
      .agg(expr(s"graft_topk(cast(__lex AS double), doc_id, $kCand)")
             .as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("q_id"), col("s.id").as("doc_id"),
              (col("p") + 1).cast("long").as("lex_rank"))

    // ---- semantic leg: exact cosine over the embedding scan ---------
    val qv = broadcast(q.select(col("q_id"), col("__qv")))
    val sem = vecs
      .select(col(vecIdCol).as("doc_id"), col(vecCol).as("__v"))
      .join(qv, col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"),
              expr("graft_cosine(__qv, __v)").as("__c"))
      .groupBy("q_id")
      .agg(expr(s"graft_topk(__c, doc_id, $kCand)").as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("q_id"), col("s.id").as("doc_id"),
              (col("p") + 1).cast("long").as("sem_rank"))

    // ---- fusion: ≤ 2·kCand rows per query from here on --------------
    def leg(rank: Column): Column =
      coalesce(round(lit(1e9) / (lit(rrfK) + rank), 0).cast("long"),
               lit(0L))
    val fused = lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
              (leg(col("lex_rank")) + leg(col("sem_rank"))).as("rrf"),
              col("lex_rank"), col("sem_rank"))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("rrf"),
              col("lex_rank"), col("sem_rank"))
  }
}
