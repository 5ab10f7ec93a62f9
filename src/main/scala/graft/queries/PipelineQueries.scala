package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.implicits._

/** The end-to-end training-data curation pipeline — every stage of the
  * engine composed into one job, the shape this library exists for:
  *
  *   1. exact dedup (md5 digest, keep first)
  *   2. near-dup removal (MinHash-LSH pairs at J ≥ 0.8; drop the higher
  *      doc_id of each pair — the deterministic survivor rule)
  *   3. quality filter (token count ≥ 20, stopword ratio < 0.5)
  *   4. Bernoulli sample via the custom Catalyst operator (the reference's
  *      own operator, in its natural habitat)
  *   5. per-language corpus statistics
  *
  * RNG sampling ⇒ rows-only driver check; PipelineSpec pins stage-by-stage
  * row accounting and determinism.
  *
  * Scale: stages 1-2 shuffle on digest / band keys, stage 3 is a map,
  * stage 4 adds no exchange, stage 5 is one partial/final aggregation.
  */
object PipelineQueries extends QueryModule {

  override def all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "pipeline_corpus_curation",
      (s, dir) => {
        GraftSession.ensureExtensions(s)
        val docs = t(s, dir, "documents")
        // 1. exact dedup
        val exactKept = docs
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text"))).orderBy("doc_id")))
          .filter(col("rk") === 1).drop("rk")
        // 2. near-dup removal: drop the b-side of every LSH-verified pair.
        // minhashLshPairs is persisted + memoized per (session, dir), so a
        // run that also executes dedup_minhash_lsh pays the signature+verify
        // job once, not twice (VERDICT r1 item 4).
        val nearDupLosers = DedupQueries.minhashLshPairs(s, dir)
          .select(col("b_id").as("doc_id")).distinct()
        // Size-gated: the loser set is tiny on clean corpora but can be a
        // large fraction of a crawl — never an unconditional broadcast.
        // Gate on the EXACT count of the persisted pair set (cheap — it is
        // already materialized/memoized), not a Catalyst estimate: the
        // estimate flips once the cache materializes, and a flipping join
        // strategy would change the partitioning under the sampler below,
        // breaking the pipeline's end-to-end determinism.
        val deduped = exactKept.join(
          gatedExact(nearDupLosers, nearDupLosers.count() * 8),
          Seq("doc_id"), "left_anti")
        // 3. quality filter
        val quality = deduped
          .withColumn("tk", expr("split(trim(text), '\\\\s+')"))
          .withColumn("stop_ratio",
            expr("size(filter(tk, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) / size(tk)"))
          .filter(size(col("tk")) >= 20 && col("stop_ratio") < 0.5)
        // 4. deterministic Bernoulli sample through the custom operator
        val sampled = quality.sampleExt(0.5, Some(2024L))
        // 5. corpus statistics
        sampled.groupBy("lang")
          .agg(count("*").as("n_docs"),
               sum(size(col("tk"))).as("n_tokens"),
               round(avg(size(col("tk"))), 2).as("avg_tokens"))
      },
      None),

    // Stratified sampling with per-stratum rates (corpus rebalancing: keep
    // half of English, a fifth of everything else). Routing is a pure map —
    // a doc is kept iff the first 4 hex chars of md5(doc_id) fall under the
    // stratum's threshold, so the sample is deterministic, partitioning-
    // independent, reproducible across engines (md5 hex compares as a
    // string in both), and needs no shuffle at all; the output aggregation
    // is the only exchange. Thresholds: floor(rate * 16^4) in hex.
    GraftQuery(
      "sample_stratified",
      (s, dir) => {
        val cut = when(col("lang") === "en", lit("8000")) // 0.5000
          .otherwise(lit("3333"))                         // 0.1999…
        t(s, dir, "documents")
          .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < cut)
          .groupBy("lang")
          .agg(count("*").as("n_kept"), min("doc_id").as("first_id"),
               sum("n_chars").as("kept_chars"))
      },
      Some("""SELECT lang, count(*) AS n_kept, min(doc_id) AS first_id,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM documents
        |WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
        |      CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END
        |GROUP BY lang""".stripMargin)),

    // Hash-routed train/test split: per-key determinism prevents
    // near-duplicate leakage across the boundary. Rows-only check;
    // PipelineSpec asserts disjointness/completeness/determinism.
    GraftQuery(
      "pipeline_train_test_split",
      (s, dir) => {
        val (train, test) = t(s, dir, "documents").splitByHash("doc_id", 0.8)
        train.select(lit("train").as("split"), col("lang"))
          .unionAll(test.select(lit("test").as("split"), col("lang")))
          .groupBy("split", "lang")
          .agg(count("*").as("n"))
      },
      None),
  )
}
