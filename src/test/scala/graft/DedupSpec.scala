package graft

import org.apache.spark.sql.functions._

/** End-to-end checks of the dedup operator family against brute-force
  * ground truth computed in-Spark at sf0.001 (500 docs) — the cross-engine
  * value check is the driver's DuckDB oracle; these specs pin the
  * algorithmic properties (LSH recall, SimHash candidate quality).
  */
class DedupSpec extends GraftFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  /** Brute-force word-3-shingle Jaccard pairs ≥ threshold (cross join). */
  private def bruteForcePairs(threshold: Double) = {
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"),
              expr("""array_distinct(transform(sequence(0, size(tk) - 3),
                     i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])))""")
                .as("s"))
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.s"), col("b.s"))))
      .withColumn("j", col("inter") /
        (size(col("a.s")) + size(col("b.s")) - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
  }

  test("minhash LSH finds exactly the brute-force near-dup pairs (J >= 0.8)") {
    val expected = bruteForcePairs(0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q("dedup_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "testdata should contain planted near-dups")
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("simhash candidates cover the high-similarity pairs") {
    val golden = bruteForcePairs(0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val simhash = q("dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(golden.nonEmpty)
    val recall = (golden & simhash).size.toDouble / golden.size
    assert(recall >= 0.8, s"simhash recall=$recall golden=${golden.size}")
  }

  test("exact dedup groups every document") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val d = q("dedup_exact")
    assert(d.agg(sum("n_copies")).head().getLong(0) == n)
  }

  test("embedding cosine pairs match brute-force HOF computation") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val expected = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
              expr("""aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D,
                      (acc, x) -> acc + x)
                      / (sqrt(aggregate(a.v, 0D, (acc, x) -> acc + x * x))
                       * sqrt(aggregate(b.v, 0D, (acc, x) -> acc + x * x)))""").as("c"))
      .filter(col("c") >= 0.35)
      .select(col("a_id"), col("b_id"), round(col("c"), 4).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = q("dedup_embedding_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
