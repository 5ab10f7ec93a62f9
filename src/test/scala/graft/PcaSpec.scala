package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraftPca, GraftSimilarity}

class PcaSpec extends GraftFunSuite {
  import spark.implicits._

  test("jacobiEigen: known 2x2 — values {3,1}, sign-fixed unit vectors") {
    val (vals, vecs) = GraftPca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r2, r2)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 }, vecs(0).mkString(","))
    // second vector: (r2, -r2) after the largest-|coord|-positive fix
    assert(math.abs(vecs(1)(0) - r2) < 1e-12 &&
           math.abs(vecs(1)(1) + r2) < 1e-12, vecs(1).mkString(","))
  }

  test("components + project: planted dominant direction is recovered, " +
       "projected variance is ordered, projection is mean-centered") {
    // deterministic anisotropic cloud: t spread along (3,1,0)/sqrt(10)
    // with a small orthogonal wiggle along (0,0,1), plus a mean offset
    val dir = Array(3.0, 1.0, 0.0).map(_ / math.sqrt(10.0))
    val pts = (0 until 200).map { i =>
      val t = (i % 40) - 19.5          // large spread along dir
      val w = ((i * 7) % 5) - 2.0      // small spread along z
      Seq(10.0 + t * dir(0), -4.0 + t * dir(1), 2.0 + w * 0.3)
    }
    val vecs = pts.toDF("v")
    val gram = GraftSimilarity.gramMatrix(vecs, "v", grid = 1024L)
    val (vals, comps, mean) = GraftPca.components(gram, grid = 1024L, k = 3)
    assert(vals(0) > vals(1) && vals(1) > vals(2),
      s"eigenvalues must come back descending: ${vals.mkString(",")}")
    assert(math.abs(mean(0) - 10.0) < 0.01 && math.abs(mean(1) + 4.0) < 0.01)
    val align = comps(0).zip(dir).map { case (a, b) => a * b }.sum.abs
    assert(align > 0.999,
      s"top component must align with the planted direction, got $align")
    val proj = GraftPca.project(vecs, comps, mean, "v")
      .select(col("pc")).as[Seq[Double]].collect()
    // per-axis projected variance must be ordered like the eigenvalues,
    // and each projected axis must be (numerically) mean-zero
    val byAxis = (0 until 3).map(a => proj.map(_(a)))
    val variances = byAxis.map(xs => xs.map(x => x * x).sum / xs.length)
    assert(variances(0) > variances(1) && variances(1) > variances(2))
    byAxis.foreach { xs =>
      assert(math.abs(xs.sum / xs.length) < 1e-6,
        "projection must be centered")
    }
    // eigensolve of the EXACT covariance is bit-deterministic
    val (vals2, comps2, _) = GraftPca.components(gram, grid = 1024L, k = 3)
    assert(vals.sameElements(vals2))
    assert(comps.zip(comps2).forall { case (a, b) => a.sameElements(b) })
  }

  test("project on a stream: stateless, batch-identical rows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val data = (0 until 50).map(i =>
      (i.toLong, Seq(i * 0.1, 1.0 - i * 0.02, math.sin(i.toDouble))))
    val batchDf = data.toDF("id", "v")
    val gram = GraftSimilarity.gramMatrix(batchDf, "v", grid = 1024L)
    val (_, comps, mean) = GraftPca.components(gram, grid = 1024L, k = 2)
    val batch = GraftPca.project(batchDf, comps, mean, "v")
      .select(col("id"), col("pc")).as[(Long, Seq[Double])]
      .collect().toMap
    val input = MemoryStream[(Long, Seq[Double])]
    val q = GraftPca.project(input.toDF().toDF("id", "v"), comps, mean, "v")
      .writeStream.format("memory").queryName("pca_stream")
      .outputMode("append").start()
    try {
      input.addData(data); q.processAllAvailable()
      val streamed = spark.table("pca_stream")
        .select(col("id"), col("pc")).as[(Long, Seq[Double])]
        .collect().toMap
      assert(streamed == batch,
        "streaming projection must equal batch bit-for-bit")
      val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(so.map(_.numRowsTotal).sum == 0,
        "projection must carry zero streaming state")
    } finally q.stop()
  }

  test("project: literal-fold and broadcast-side paths are bit-identical " +
       "across the size gate") {
    val data = (0 until 40).map(i =>
      (i.toLong, Seq(i * 0.1, 1.0 - i * 0.02, math.sin(i.toDouble),
                     math.cos(i * 0.3))))
    val df = data.toDF("id", "v")
    val gram = GraftSimilarity.gramMatrix(df, "v", grid = 1024L)
    val (_, comps, mean) = GraftPca.components(gram, grid = 1024L, k = 3)
    // k*d = 12 doubles: default gate folds literals; maxLiteralDoubles=1
    // forces the broadcast-side path on the SAME components
    val folded = GraftPca.project(df, comps, mean, "v")
    val bcast = GraftPca.project(df, comps, mean, "v",
                                 maxLiteralDoubles = 1)
    assert(!folded.queryExecution.optimizedPlan.toString.contains("Join"))
    assert(bcast.queryExecution.optimizedPlan.toString.contains("Join"),
      "past the gate the components must ride a join, not the plan tree")
    val f = folded.select(col("id"), col("pc")).as[(Long, Seq[Double])]
      .collect().toMap
    val g = bcast.select(col("id"), col("pc")).as[(Long, Seq[Double])]
      .collect().toMap
    assert(f == g, "gate paths must project bit-identically")
    // the gated path stays streaming-legal (stream-static cross join)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Seq[Double])]
    val q = GraftPca.project(input.toDF().toDF("id", "v"), comps, mean, "v",
                             maxLiteralDoubles = 1)
      .writeStream.format("memory").queryName("pca_stream_gated")
      .outputMode("append").start()
    try {
      input.addData(data); q.processAllAvailable()
      val streamed = spark.table("pca_stream_gated")
        .select(col("id"), col("pc")).as[(Long, Seq[Double])]
        .collect().toMap
      assert(streamed == f,
        "gated streaming projection must equal batch bit-for-bit")
    } finally q.stop()
  }
}
