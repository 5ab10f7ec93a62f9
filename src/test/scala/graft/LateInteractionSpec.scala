package graft

import org.apache.spark.sql.functions._
import graft.operators.LateInteraction

/** [[graft.operators.LateInteraction]] — ColBERT-style MaxSim over ±1
  * hash token embeddings, integer-exact end to end. */
class LateInteractionSpec extends GraftFunSuite {
  import spark.implicits._

  test("hashTokenVectors: deterministic ±1 vectors, identical tokens " +
       "collide, distinct-token bag capped at maxTokens") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta beta"),
      (3L, "   ")).toDF("doc_id", "text")
    val tv = LateInteraction.hashTokenVectors(docs, dim = 8, maxTokens = 3)
    val rows = tv.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Int](2))).toSeq
    // doc 1: first 3 tokens = alpha beta alpha → distinct {alpha, beta}
    assert(rows.filter(_._1 == 1L).map(_._2).toSet == Set("alpha", "beta"))
    // doc 2 collapses to one token; blank doc 3 yields nothing
    assert(rows.filter(_._1 == 2L).map(_._2) == Seq("beta"))
    assert(!rows.exists(_._1 == 3L))
    // identical token ⇒ identical vector across documents; components ±1
    val beta1 = rows.find(r => r._1 == 1L && r._2 == "beta").get._3
    val beta2 = rows.find(r => r._1 == 2L && r._2 == "beta").get._3
    assert(beta1 == beta2 && beta1.length == 8 &&
           beta1.forall(x => x == 1 || x == -1))
    // deterministic across invocations
    assert(LateInteraction.hashTokenVectors(docs, dim = 8, maxTokens = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[Int](2)))
      .toSet == rows.toSet)
  }

  test("maxSimTopK: hand-checkable MaxSim — shared tokens contribute " +
       "dim each, per-token max not sum-of-pairs, self excluded") {
    val dim = 8
    val docs = Seq(
      (1L, "alpha beta"),          // the query doc
      (2L, "alpha beta gamma"),    // shares both query tokens
      (3L, "alpha delta"),         // shares one
      (4L, "epsilon zeta")).toDF("doc_id", "text")
    val dt = LateInteraction.hashTokenVectors(docs, dim = dim)
    val qt = dt.filter(col("doc_id") === 1L)
      .select(col("doc_id").as("q_id"), col("tok"), col("tv"))
    val out = LateInteraction.maxSimTopK(dt, qt, k = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet == Set(2L, 3L, 4L))
    val byDoc = out.map(r => r._1 -> r._3).toMap
    // doc 2 holds both query tokens exactly: each query token's max is
    // the self-dot = dim, so score = 2·dim regardless of gamma (per-token
    // MAX, never sum over pairs)
    assert(byDoc(2L) == 2L * dim, s"got $byDoc")
    // doc 3 matches one token exactly (contributes dim); the other query
    // token's best match is whatever 'alpha'/'delta' hash dots give — a
    // value in [-dim, dim], so dim - dim <= score3 < 2*dim and the exact-
    // double-match doc must rank first
    assert(byDoc(3L) < byDoc(2L) && byDoc(3L) >= 0L - dim + dim)
    assert(out.find(_._1 == 2L).get._2 == 1L, "doc 2 must rank first")
    // ranks contiguous from 1
    assert(out.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("maxSimTopKWith: covering probes reproduce the exact MaxSim " +
       "bit-for-bit through the token-level IVF index; composite ids " +
       "decode to doc ids") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dt = LateInteraction.hashTokenVectors(docs, dim = 8,
                                              maxTokens = 16).persist()
    try {
      val qt = dt.filter(col("doc_id") < 10)
        .select(col("doc_id").as("q_id"), col("tok"), col("tv"))
      val exact = graft.operators.LateInteraction.maxSimTopK(dt, qt, k = 10)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val idx = LateInteraction.tokenIndex(dt).persist()
      try {
        val cells = idx.centroids.count().toInt
        val served = LateInteraction.maxSimTopKWith(idx, qt, k = 10,
                                                    nprobe = cells)
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(served == exact,
          s"covering-probe MaxSim must equal the exact contraction: " +
          s"served-only=${served.diff(exact).take(3)} " +
          s"exact-only=${exact.diff(served).take(3)}")
        // every indexed composite id decodes below the doc-id radix
        val ords = idx.assigned
          .select(expr(s"n_id % ${LateInteraction.TokenIdBase}").as("o"))
          .agg(max(col("o"))).collect()(0).getLong(0)
        assert(ords < LateInteraction.TokenIdBase)
        // a REAL probe cut stays a plausible approximation: k rows per
        // query at most, scores never exceed the exact ones
        val cut = LateInteraction.maxSimTopKWith(idx, qt, k = 10, nprobe = 1)
          .collect()
        val exactScore = exact.map(r => (r._1, r._2) -> r._4).toMap
        assert(cut.forall(r => r.getLong(2) <= 10))
        assert(cut.forall { r =>
          val key = (r.getLong(0), r.getLong(1))
          !exactScore.contains(key) || r.getLong(3) <= exactScore(key)
        }, "a probe cut can only lose evidence, never invent it")
      } finally { idx.unpersist(); () }
    } finally { dt.unpersist(); () }
  }

  test("maxSimServeStream: the online MaxSim answers each watermark-" +
       "closed query identically to the batch serve at the same nprobe, " +
       "across micro-batch boundaries; blank queries get no answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    GraftSession.ensureExtensions(spark)
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dt = LateInteraction.hashTokenVectors(docs, dim = 8,
                                              maxTokens = 16).persist()
    val idx = LateInteraction.tokenIndex(dt).persist()
    try {
      val qt = dt.filter(col("doc_id") < 10)
        .select(col("doc_id").as("q_id"), col("tok"), col("tv"))
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val batch = LateInteraction.maxSimTopKWith(idx, qt, k = 5, nprobe = 4)
        .collect().map(key).toSet
      assert(batch.nonEmpty)
      val rows = docs.filter(col("doc_id") < 10)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), ts(r.getLong(0).toInt % 8), r.getString(1)))
        .sortBy(_._1).toSeq
      val (h1, h2) = rows.splitAt(rows.size / 2)
      val input = MemoryStream[(Long, Timestamp, String)]
      val q = graft.streaming.CorpusStreams
        .maxSimServeStream(idx, input.toDF().toDF("q_id", "ts", "text"),
                           k = 5, nprobe = 4)
        .writeStream.format("memory").queryName("maxsim_serve")
        .outputMode("append").start()
      try {
        input.addData(h1); q.processAllAvailable()
        input.addData(h2 :+ ((888888L, ts(3), "   "))) // blank: dropped
        q.processAllAvailable()
        input.addData(Seq((999999L, ts(600), "advance the watermark")))
        q.processAllAvailable()
        val streamed = spark.table("maxsim_serve")
          .filter(col("q_id") < 888888L)
          .select("q_id", "doc_id", "rnk", "score")
          .collect().map(key).toSet
        assert(streamed == batch,
          s"stream-only=${streamed.diff(batch).take(3)} " +
          s"batch-only=${batch.diff(streamed).take(3)}")
        assert(spark.table("maxsim_serve")
                 .filter(col("q_id") === 888888L).count() == 0,
          "a blank query must be dropped, not answered or fatal")
      } finally q.stop()
    } finally { idx.unpersist(); dt.unpersist(); () }
  }
}
