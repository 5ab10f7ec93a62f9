package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Three tiers, mirroring how a production pipeline scales:
  *   1. `ann_cosine_topk` — brute-force exact top-k: broadcast the (small)
  *      query set against the full collection; one window per query for the
  *      top-k cut. Exact answer, linear scan — the correctness baseline.
  *   2. `ann_ivf_topk` — IVF: deterministic coarse quantizer (every 31st
  *      vector is a centroid), vectors partitioned into cells by nearest
  *      centroid, queries probe the 4 nearest cells and rerank exactly.
  *      Scan cost drops to ~nprobe/ncells of the collection; fully
  *      deterministic, so the same algorithm runs as a DuckDB oracle.
  *   3. `ann_lsh_bucket` — sign-random-projection LSH: 16-bit signatures
  *      from pseudo-random hyperplanes (hash-derived, no RNG state), 4×4-bit
  *      bands for candidate generation, exact rerank. Hash bits are
  *      engine-specific ⇒ rows-only driver check; SimilaritySpec measures
  *      recall against tier 1.
  *
  * At 100 TB: tier 1 is a broadcast-map (no shuffle) per query batch;
  * tier 2 shuffles once on cell id (both sides co-partitioned by cell);
  * tier 3 shuffles once on (band, bucket). All reranks are per-partition.
  */
object SimilarityQueries extends QueryModule {

  /** Cosine between two array<double> columns via the native codegen
    * expression — strict left-to-right summation keeps it bitwise-identical
    * to DuckDB's computation (oracle hash-match) while avoiding interpreted
    * lambda evaluation. Callers must have graft extensions installed.
    */
  private def cosine(a: String, b: String): Column =
    expr(s"graft_cosine($a, $b)")

  private def vecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
              expr("transform(embedding, x -> cast(x AS double))").as("v"))

  override def all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "ann_cosine_topk",
      (s, dir) => {
        graft.GraftSession.ensureExtensions(s)
        val e = vecs(s, dir)
        val q = broadcast(
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("v").as("qv")))
        val w = Window.partitionBy("q_id").orderBy(desc("c"), asc("n_id"))
        e.join(q, col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
                  cosine("qv", "v").as("c"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("rnk"),
                  round(col("c"), 4).as("cos"))
      },
      Some("""WITH q AS (
        |  SELECT vec_id q_id, embedding qe FROM embeddings WHERE vec_id < 10),
        |s AS (
        |  SELECT q_id, e.vec_id n_id,
        |    list_cosine_similarity(qe::DOUBLE[], e.embedding::DOUBLE[]) c
        |  FROM q JOIN embeddings e ON e.vec_id != q_id),
        |r AS (SELECT q_id, n_id, c,
        |        row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) rnk
        |      FROM s)
        |SELECT q_id, n_id, rnk, round(c, 4) AS cos FROM r WHERE rnk <= 5""".stripMargin)),

    GraftQuery(
      "ann_ivf_topk",
      (s, dir) => {
        graft.GraftSession.ensureExtensions(s)
        val e = vecs(s, dir)
        // ncells ≈ √N (standard IVF sizing): assign work is N·√N cosines,
        // each probe scans ~nprobe·√N vectors, and the centroid set stays
        // broadcastable at any N. Round 1's fixed stride of 31 made the
        // centroid count linear in N — the assign step was O(N²/31).
        val stride = math.ceil(math.sqrt(e.count().toDouble)).toLong
        val cents = broadcast(
          e.filter(col("vec_id") % stride === 0)
            .select(col("vec_id").as("c_id"), col("v").as("cv")))
        // assign: nearest centroid per vector (ties → lowest c_id) via a
        // map-side partial max(struct) argmax — round 1's row_number window
        // shuffled and sorted all N·C scored rows with vectors attached;
        // the partial agg collapses to one row per vector pre-exchange.
        val assigned = e.join(cents)
          .select(col("vec_id"), col("v"), col("c_id"), cosine("v", "cv").as("cc"))
          .groupBy("vec_id")
          .agg(max(struct(col("cc"), (-col("c_id")).as("nc"))).as("m"),
               first(col("v")).as("v"))
          .select(col("vec_id"), col("v"), (-col("m.nc")).as("c_id"))
        // queries probe their 4 nearest centroids
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val wProbe = Window.partitionBy("q_id").orderBy(desc("qc"), asc("c_id"))
        val probes = q.join(cents)
          .select(col("q_id"), col("qv"), col("c_id"), cosine("qv", "cv").as("qc"))
          .withColumn("prnk", row_number().over(wProbe))
          .filter(col("prnk") <= 4)
          .select(col("q_id"), col("qv"), col("c_id"))
        // rerank exactly within probed cells
        val wTop = Window.partitionBy("q_id").orderBy(desc("c"), asc("n_id"))
        probes.join(assigned, "c_id")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"), cosine("qv", "v").as("c"))
          .withColumn("rnk", row_number().over(wTop).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("rnk"),
                  round(col("c"), 4).as("cos"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
        |c AS (SELECT vec_id c_id, v cv FROM e
        |      WHERE vec_id % (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
        |                      FROM embeddings) = 0),
        |assign AS (
        |  SELECT vec_id, v, c_id FROM (
        |    SELECT e.vec_id, e.v, c.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id) arnk
        |    FROM e, c) WHERE arnk = 1),
        |q AS (SELECT vec_id q_id, v qv FROM e WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, qv, c_id FROM (
        |    SELECT q.q_id, q.qv, c.c_id,
        |      row_number() OVER (PARTITION BY q.q_id
        |        ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.c_id) prnk
        |    FROM q, c) WHERE prnk <= 4),
        |scored AS (
        |  SELECT p.q_id, a.vec_id n_id,
        |    list_cosine_similarity(p.qv, a.v) c
        |  FROM probes p JOIN assign a ON p.c_id = a.c_id
        |  WHERE a.vec_id != p.q_id),
        |r AS (SELECT q_id, n_id, c,
        |        row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) rnk
        |      FROM scored)
        |SELECT q_id, n_id, rnk, round(c, 4) AS cos FROM r WHERE rnk <= 5""".stripMargin)),

    GraftQuery(
      "ann_lsh_bucket",
      (s, dir) => {
        graft.GraftSession.ensureExtensions(s)
        val e = vecs(s, dir)
        // 16 pseudo-random hyperplanes via the native codegen expression —
        // hash-derived components, no executor random state.
        val sigs = e.withColumn("sig", expr("graft_srp_sig(v, 16)"))
          .select(col("vec_id"), col("v"), col("sig"))
        val banded = sigs.select(col("vec_id"), col("v"),
          explode(expr("""transform(sequence(0, 3),
                 b -> struct(b AS band_id,
                             shiftright(sig, 4 * b) & 15 AS bucket))""")).as("bb"))
          .select(col("vec_id"), col("v"), col("bb.band_id"), col("bb.bucket"))
        val q = banded.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("band_id"), col("bucket"))
        // skinny candidate pairs first; vectors re-attached size-gated —
        // broadcast while the embedding table fits an executor, SHUFFLE_HASH
        // past the gate (an unconditional broadcast of the full embedding
        // table was round-1's scale defect here).
        val cand = q
          .join(banded.select(col("vec_id"), col("band_id"), col("bucket")),
                Seq("band_id", "bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"))
          .distinct()
        val wTop = Window.partitionBy("q_id").orderBy(desc("c"), asc("n_id"))
        cand
          .join(gated(e.select(col("vec_id").as("n_id"), col("v"))), "n_id")
          .join(gated(e.select(col("vec_id").as("q_id"), col("v").as("qv"))), "q_id")
          .select(col("q_id"), col("n_id"), cosine("qv", "v").as("c"))
          .withColumn("rnk", row_number().over(wTop).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("rnk"),
                  round(col("c"), 4).as("cos"))
      },
      None),
  )
}
