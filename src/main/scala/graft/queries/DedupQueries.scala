package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` — exact dedup,
  * MinHash+LSH near-dup, character-n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *   - exact dedup: hash-groupBy on a 128-bit digest — one shuffle keyed by
  *     digest, map-side partial agg; never ships full text twice.
  *   - MinHash+LSH: signatures are a pure map (no shuffle); the candidate
  *     join shuffles on (band_id, band_hash) — only documents sharing a
  *     bucket ever meet, so the pair space is ~linear, not quadratic. The
  *     exact-Jaccard verify joins candidates back to shingle sets by doc_id.
  *     128 hashes in bands of 2 ⇒ P(miss | J≥0.8) = (1−J²)^64 ≤ 4e-13, so
  *     the LSH output equals the brute-force oracle with overwhelming
  *     probability — which is what makes this query DuckDB-checkable.
  *   - n-gram Jaccard: explode-on-gram equi-join (pairs meet only via shared
  *     grams) + count aggregation; lang used as a blocking key. Hot grams
  *     skew the join at scale → the production path would add frequency
  *     prefix-filtering; structure is identical.
  *   - embedding cosine: brute-force all-pairs at test SF (the verifiable
  *     oracle); the scale path is the LSH/IVF variant in SimilarityQueries.
  */
object DedupQueries extends QueryModule {

  /** (doc_id, shingles): distinct word-3-shingles per document. Pure map. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"),
              expr("""array_distinct(transform(sequence(0, size(tk) - 3),
                     i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])))""")
                .as("shingles"))

  override def all: Seq[GraftQuery] = Seq(

    // Exact dedup: group by content digest, keep first doc_id as the
    // representative. One digest-keyed shuffle at any scale.
    GraftQuery(
      "dedup_exact",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(count("*").as("n_copies"), min("doc_id").as("keep_doc_id")),
      Some("""SELECT md5(text) AS text_md5, count(*) AS n_copies,
        |  min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY md5(text)""".stripMargin)),

    // MinHash + LSH near-duplicate pairs at word-3-shingle Jaccard ≥ 0.8.
    // Output is LSH-candidates → exact-verified, which (at recall ≈ 1 by
    // the band math above) hash-matches the brute-force DuckDB oracle.
    GraftQuery(
      "dedup_minhash_lsh",
      (s, dir) => {
        val sh = shingled(s, dir)
        // 128-permutation signature: sig[j] = min over shingles of h_j(s),
        // h_j = xxhash64(shingle, j). Pure map, codegen'd HOFs.
        val sig = sh.withColumn("sig",
          expr("""transform(sequence(0, 127),
                 j -> array_min(transform(shingles, s -> xxhash64(s, j))))"""))
        // 64 bands × 2 rows: band key = hash of the 2-slice.
        val bands = sig.select(col("doc_id"),
          explode(expr("""transform(sequence(0, 63),
                 b -> struct(b AS band_id,
                             xxhash64(sig[2 * b], sig[2 * b + 1]) AS band_hash))"""))
            .as("bh"))
          .select(col("doc_id"), col("bh.band_id"), col("bh.band_hash"))
        val cand = bands.as("x")
          .join(bands.as("y"),
                col("x.band_id") === col("y.band_id") &&
                col("x.band_hash") === col("y.band_hash") &&
                col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .distinct()
        // Exact verify on the candidate set only.
        cand
          .join(sh.select(col("doc_id").as("a_id"), col("shingles").as("sa")), "a_id")
          .join(sh.select(col("doc_id").as("b_id"), col("shingles").as("sb")), "b_id")
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
          .withColumn("jaccard",
            col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
          .filter(col("jaccard") >= 0.8)
          .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |                                FOR i IN range(1, len(tk) - 1)]) s
        |  FROM toks WHERE len(tk) >= 3),
        |e AS (SELECT doc_id, unnest(s) g FROM sh),
        |sz AS (SELECT doc_id, count(*) n FROM e GROUP BY doc_id),
        |pair AS (
        |  SELECT a.doc_id a_id, b.doc_id b_id, count(*) i
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT a_id, b_id, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        |FROM pair
        |JOIN sz sa ON sa.doc_id = a_id
        |JOIN sz sb ON sb.doc_id = b_id
        |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8""".stripMargin)),

    // Character-3-gram Jaccard near-dup pairs, lang-blocked, via the
    // scalable explode-join-count plan (no cross join).
    GraftQuery(
      "dedup_ngram_jaccard",
      (s, dir) => {
        val g = t(s, dir, "documents")
          .filter(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"),
                  explode(expr(
                    """array_distinct(transform(sequence(1, length(text) - 2),
                       i -> substring(text, i, 3)))""")).as("gr"))
        val sz = g.groupBy("doc_id").agg(count("*").as("n"))
        g.as("a")
          .join(g.as("b"),
                col("a.gr") === col("b.gr") && col("a.lang") === col("b.lang") &&
                col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count("*").as("inter"))
          .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
          .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
          .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
          .filter(col("jaccard") >= 0.75)
          .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      },
      Some("""WITH g AS (
        |  SELECT doc_id, lang,
        |    unnest(list_distinct([substr(text, i, 3)
        |                          FOR i IN range(1, length(text) - 1)])) gr
        |  FROM documents WHERE length(text) >= 3),
        |sz AS (SELECT doc_id, count(*) n FROM g GROUP BY doc_id),
        |pair AS (
        |  SELECT a.doc_id a_id, b.doc_id b_id, count(*) i
        |  FROM g a JOIN g b ON a.gr = b.gr AND a.lang = b.lang
        |                   AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT a_id, b_id, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        |FROM pair
        |JOIN sz sa ON sa.doc_id = a_id
        |JOIN sz sb ON sb.doc_id = b_id
        |WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.75""".stripMargin)),

    // Embedding-cosine near-duplicate pairs (cos ≥ 0.35). Brute-force
    // all-pairs with double-precision dot products — the exact oracle;
    // the sub-quadratic path is SimilarityQueries' LSH/IVF.
    GraftQuery(
      "dedup_embedding_cosine",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"),
                  expr("transform(embedding, x -> cast(x AS double))").as("v"))
        e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
                  expr("""aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D,
                                    (acc, x) -> acc + x)
                          / (sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x))
                           * sqrt(aggregate(b.v, 0D, (acc, x) -> acc + x * x)))""")
                    .as("cos"))
          .filter(col("cos") >= 0.35)
          .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
      },
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                               b.embedding::DOUBLE[]), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[],
        |                             b.embedding::DOUBLE[]) >= 0.35""".stripMargin)),
  )
}
