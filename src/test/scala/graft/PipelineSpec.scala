package graft

import org.apache.spark.sql.functions._

/** Stage accounting for the composed curation pipeline. */
class PipelineSpec extends GraftFunSuite {

  test("curation pipeline: composes dedup, quality, sample; deterministic") {
    val out = SparkEntry.queries("pipeline_corpus_curation")(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    // sampling halves the near-dup-free, quality-passing corpus
    assert(total > 0 && total < nDocs)
    // near-dup losers are excluded: the kept set must not contain the
    // b-side of any verified near-dup pair
    val losers = SparkEntry.queries("dedup_minhash_lsh")(spark, sf0001)
      .select("b_id").distinct().count()
    assert(losers > 0, "testdata has planted near-dups")
    // deterministic end to end (fixed sample seed)
    val again = SparkEntry.queries("pipeline_corpus_curation")(spark, sf0001)
      .collect()
    assert(rows.map(_.toString).sorted.toSeq ==
           again.map(_.toString).sorted.toSeq)
  }

  test("splitByHash: disjoint, complete, key-deterministic, ratio-correct") {
    import graft.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val (train, test) = docs.splitByHash("doc_id", 0.8)
    val nTrain = train.count()
    val nTest = test.count()
    assert(nTrain + nTest == docs.count(), "split must be complete")
    assert(train.select("doc_id").intersect(test.select("doc_id")).count() == 0,
      "split must be disjoint")
    assert(math.abs(nTrain.toDouble / (nTrain + nTest) - 0.8) < 0.06)
    // deterministic under repartitioning
    val (train2, _) = docs.repartition(13).splitByHash("doc_id", 0.8)
    assert(train2.select("doc_id").except(train.select("doc_id")).count() == 0)
    intercept[IllegalArgumentException](docs.splitByHash("doc_id", 1.0))
  }

  test("splitByHexHash: same guarantees, md5-routed (cross-engine form)") {
    import graft.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val (train, test) = docs.splitByHexHash("doc_id", 0.8)
    val nTrain = train.count()
    val nTest = test.count()
    assert(nTrain + nTest == docs.count(), "split must be complete")
    assert(train.select("doc_id").intersect(test.select("doc_id")).count() == 0,
      "split must be disjoint")
    assert(math.abs(nTrain.toDouble / (nTrain + nTest) - 0.8) < 0.06)
    // routing matches the md5 rule any engine would compute
    val misrouted = train.withColumn("r",
        substring(md5(col("doc_id").cast("string")), 1, 4))
      .filter(col("r") >= "cccc").count()
    assert(misrouted == 0)
    val (train2, _) = docs.repartition(13).splitByHexHash("doc_id", 0.8)
    assert(train2.select("doc_id").except(train.select("doc_id")).count() == 0)
    intercept[IllegalArgumentException](docs.splitByHexHash("doc_id", 0.0))
  }

  test("splitByHexHash: NULL keys route to exactly one side; sub-granularity " +
       "fractions are rejected") {
    import graft.implicits._
    import spark.implicits._
    // md5(null) is null — before the sentinel fix a null-key row fell out
    // of BOTH sides, breaking the complete+disjoint contract
    val rows = Seq((Some(1L), "a"), (None, "b"), (None, "c"), (Some(2L), "d"))
      .toDF("k", "v")
    val (tr, te) = rows.splitByHexHash("k", 0.5)
    assert(tr.count() + te.count() == 4, "null-key rows must not vanish")
    assert(tr.intersect(te).count() == 0)
    // determinism: both null rows land on the SAME side (same sentinel hash)
    val nullSides = Seq(tr, te).map(_.filter(col("k").isNull).count())
    assert(nullSides.contains(2L) && nullSides.contains(0L), nullSides)
    // 1/100000 < 1/65536 would floor to an empty train side — reject
    intercept[IllegalArgumentException](rows.splitByHexHash("k", 0.00001))
  }

  test("weightedSample: deterministic E-S selection, weight-monotone, " +
       "non-positive weights excluded") {
    import graft.operators.CorpusCuration
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val sel = CorpusCuration.weightedSample(docs, k = 50,
      weightCol = "n_chars").select("doc_id").as[Long].collect().toSet
    assert(sel.size == 50)
    // deterministic and partitioning-independent
    val again = CorpusCuration.weightedSample(docs.repartition(7), k = 50,
      weightCol = "n_chars").select("doc_id").as[Long].collect().toSet
    assert(again == sel)
    // selection probability rises with weight: the mean n_chars of the
    // sample should clearly exceed the corpus mean (weights span ~10x)
    val selMean = CorpusCuration.weightedSample(docs, 50, "n_chars")
      .agg(avg("n_chars")).head().getDouble(0)
    val allMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(selMean > allMean,
      s"weighted mean $selMean should exceed corpus mean $allMean")
    // a zero/negative-weight row can never be selected
    val withZero = docs.unionByName(
      Seq((99999L, 0L), (99998L, -5L)).toDF("doc_id", "n_chars"))
    val z = CorpusCuration.weightedSample(withZero, k = 600, "n_chars")
      .select("doc_id").as[Long].collect().toSet
    assert(!z.contains(99999L) && !z.contains(99998L))
    intercept[IllegalArgumentException](
      CorpusCuration.weightedSample(docs, 0, "n_chars"))
  }
}
