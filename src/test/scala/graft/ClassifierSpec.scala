package graft

import org.apache.spark.sql.functions._

import graft.operators.GraftClassifier
import graft.streaming.CorpusStreams

/** [[GraftClassifier]] — multinomial Naive Bayes over hashed unigrams.
  * The DuckDB oracle (`pipeline_nb_classify`) certifies cross-engine
  * bit-parity of train + apply; this suite pins the semantic laws the
  * oracle can't express: determinism across runs/partitionings, the
  * argmax tie-break, the dense-model contract, prior sensitivity, and
  * stream ≡ batch prediction parity.
  */
class ClassifierSpec extends GraftFunSuite {

  private def docs() = spark.read.parquet(s"$sf0001/documents.parquet")

  private lazy val model =
    GraftClassifier.nbTrain(docs().filter(col("doc_id") % 5 =!= 0))

  test("nbClassify is deterministic and labels come from the train set") {
    val out = GraftClassifier.nbClassify(
      docs().filter(col("doc_id") % 5 === 0), model)
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getLong(3))).sortBy(_._1)
    val b = GraftClassifier.nbClassify(
        docs().filter(col("doc_id") % 5 === 0).repartition(7), model)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b),
      "predictions must not depend on input partitioning")
    val trainLabels = docs().filter(col("doc_id") % 5 =!= 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(a.map(_._3).toSet.subsetOf(trainLabels))
  }

  test("accuracy beats the majority-class baseline on the held-out split") {
    val test = docs().filter(col("doc_id") % 5 === 0)
    val joined = GraftClassifier.nbClassify(test, model)
      .join(test.select("doc_id", "lang"), "doc_id")
    val n = joined.count()
    val correct =
      joined.filter(col("pred_label") === col("lang")).count()
    val majority = test.groupBy("lang").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(correct.toDouble / n > majority.toDouble / n * 0.8,
      s"accuracy $correct/$n not in the ballpark of majority $majority/$n" +
      " — the model learned nothing")
  }

  test("argmax tie-break: equal scores resolve to the ascending label") {
    import spark.implicits._
    // two labels, mirrored corpora: every word appears once per label,
    // so all (bucket, label) likelihoods and priors are symmetric —
    // scores tie exactly and the tie-break must pick the smaller label
    val train = Seq(("zz", "alpha beta gamma"), ("aa", "alpha beta gamma"))
      .toDF("lang", "text").withColumn("doc_id", lit(1L))
    val m = GraftClassifier.nbTrain(train)
    val out = GraftClassifier.nbClassify(
      Seq((9L, "alpha beta")).toDF("doc_id", "text"), m).collect()
    assert(out.length == 1 && out(0).getString(2) == "aa",
      s"tie must break to the ascending label, got ${out(0).getString(2)}")
  }

  test("priors matter: an empty-gram-overlap doc goes to the " +
       "higher-prior class") {
    import spark.implicits._
    // 'big' has 3 training docs, 'sml' has 1; the probe shares no words
    // with either corpus, so only smoothed floors + priors differ
    val train = Seq(("big", "x1 x2"), ("big", "x3 x4"), ("big", "x5 x6"),
                    ("sml", "y1 y2")).toDF("lang", "text")
    val m = GraftClassifier.nbTrain(train)
    val out = GraftClassifier.nbClassify(
      Seq((1L, "unseen1 unseen2 unseen3")).toDF("doc_id", "text"), m)
      .collect()
    assert(out(0).getString(2) == "big",
      "with no evidence the document must fall to the larger prior " +
      s"(got ${out(0).getString(2)})")
  }

  test("dense-model contract: a filtered weight table is refused") {
    val broken = GraftClassifier.NbModel(
      model.priors, model.weights.filter(col("bucket") =!= 17),
      model.buckets)
    val e = intercept[IllegalArgumentException] {
      GraftClassifier.collectModel(broken)
    }
    assert(e.getMessage.contains("DENSE"))
  }

  test("nbClassifyStream: stream predictions equal batch predictions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val test = docs().filter(col("doc_id") % 5 === 0)
    val batch = GraftClassifier.nbClassify(test, model)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).sortBy(_._1)
    val rows = test.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val q = CorpusStreams.nbClassifyStream(
        input.toDF().toDF("doc_id", "text"), model)
      .select("doc_id", "n_grams", "pred_label", "nb_score")
      .writeStream.format("memory").queryName("nbc_par").outputMode("append")
      .start()
    try {
      input.addData(rows.take(rows.size / 2)); q.processAllAvailable()
      input.addData(rows.drop(rows.size / 2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("nbc_par")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(streamed.sameElements(batch),
      "streaming classification must equal the batch operator exactly")
  }
}
