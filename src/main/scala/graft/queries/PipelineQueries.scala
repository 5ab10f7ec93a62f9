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
        import graft.operators.CorpusCuration
        val docs = t(s, dir, "documents")
        // 1. exact dedup (digest-keyed shuffle, keep lowest doc_id)
        val exactKept = CorpusCuration.exactDedup(docs)
        // 2. near-dup removal: drop the b-side of every LSH-verified pair.
        // minhashLshPairs is persisted + memoized per (session, dir), so a
        // run that also executes dedup_minhash_lsh pays the signature+verify
        // job once, not twice (VERDICT r1 item 4). The anti-join side is
        // gated on its EXACT count inside removeNearDups — a Catalyst
        // estimate flips across cache materialization, and a flipping join
        // strategy would change the partitioning under the sampler below,
        // breaking the pipeline's end-to-end determinism.
        val deduped = CorpusCuration.removeNearDups(
          exactKept, DedupQueries.minhashLshPairs(s, dir))
        // 3. quality filter (pure map; keeps the tk column for stage 5)
        val quality = CorpusCuration.qualityFilter(deduped)
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
      (s, dir) =>
        graft.operators.CorpusCuration.stratifiedSample(
            t(s, dir, "documents"),
            rates = Map("en" -> 0.5), defaultRate = 0.2, stratumCol = "lang")
          .groupBy("lang")
          .agg(count("*").as("n_kept"), min("doc_id").as("first_id"),
               sum("n_chars").as("kept_chars")),
      Some("""SELECT lang, count(*) AS n_kept, min(doc_id) AS first_id,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM documents
        |WHERE substr(md5(doc_id::VARCHAR), 1, 4) <
        |      CASE WHEN lang = 'en' THEN '8000' ELSE '3333' END
        |GROUP BY lang""".stripMargin)),

    // Benchmark-contamination detection: train-split documents sharing any
    // word-8-gram with a test-split document — the leakage audit every
    // training corpus needs before a model ships. The split is md5-hex
    // threshold routing (cross-engine deterministic, same as
    // sample_stratified); the overlap test is a semi join on the gram.
    // Scale: the gram explode is a pure map; the semi join shuffles on the
    // gram key with map-side distinct — at 100 TB you'd key the join on
    // xxhash64(gram) to ship 8 bytes per gram instead of the string (same
    // plan shape; the string key here keeps the oracle cross-engine).
    GraftQuery(
      "pipeline_contamination",
      (s, dir) => {
        val route = substring(md5(col("doc_id").cast("string")), 1, 4)
        val docs = t(s, dir, "documents").withColumn("route", route)
        graft.operators.CorpusCuration.contaminatedDocs(
            train = docs.filter(col("route") < "cccc"),
            test = docs.filter(col("route") >= "cccc"), n = 8)
          .groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
      },
      Some("""WITH tk AS (
        |  SELECT doc_id, lang, substr(md5(doc_id::VARCHAR), 1, 4) route,
        |         regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, route,
        |    unnest(list_distinct([array_to_string(w[i:i+7], ' ')
        |                          FOR i IN range(1, len(w) - 6)])) gram
        |  FROM tk WHERE len(w) >= 8),
        |test_grams AS (SELECT DISTINCT gram FROM g WHERE route >= 'cccc'),
        |contaminated AS (
        |  SELECT DISTINCT g.doc_id, g.lang FROM g
        |  WHERE route < 'cccc' AND gram IN (SELECT gram FROM test_grams))
        |SELECT lang, count(*) AS n_contaminated
        |FROM contaminated GROUP BY lang""".stripMargin)),

    // Fixed-SIZE uniform sample: exactly n rows, chosen as the n smallest
    // md5(key) values — deterministic, engine-independent, and planned as
    // TakeOrderedAndProject (per-partition top-n + merge of n·P candidates),
    // NEVER a global sort. The scale contrast to sample_bernoulli's
    // fixed-RATE sampling: "give me exactly 100k docs from 100 TB" is a
    // top-k on a hash, not a shuffle-the-world orderBy.
    GraftQuery(
      "sample_fixed_size",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
                  md5(col("doc_id").cast("string")).as("r"))
          .orderBy("r").limit(100)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"), min("doc_id").as("first_id")),
      Some("""WITH s AS (
        |  SELECT doc_id, lang FROM documents
        |  ORDER BY md5(doc_id::VARCHAR) LIMIT 100)
        |SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
        |FROM s GROUP BY lang""".stripMargin)),

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
