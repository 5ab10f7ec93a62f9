package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe (optimization guide §1, r17): split ONE hybrid
  * store-lifecycle row into its phases — index build+write, store
  * read-back, serve-plan construction (collects/counts included), serve
  * execution — so the per-phase cost is attributable where ProbeJobs'
  * job list (40+ anonymous sub-second jobs) is not. Measurement tooling
  * only; no query code.
  *
  * Usage: runMain graft.ProbePhases [reps]
  *   env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (ProbeJobs defaults)
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    import graft.operators.{GraftSimilarity, HybridRetrieval}

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"== ann_hybrid_q8 phases, rep $rep")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val queries = docs.filter(col("doc_id") < 10)
        .join(e, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("q_id"),
                graft.operators.GraftText.whitespaceTokens(col("text"))
                  .as("q_terms"),
                col("v").as("qv"))
      val out = s"/tmp/graft_io/${new java.io.File(sfDir).getName}" +
        "/hybrid_q8_store"
      val idx = phase("buildIvfIndex (lazy)") {
        GraftSimilarity.buildIvfIndex(e)
      }
      phase("writeIvfIndex") { GraftSimilarity.writeIvfIndex(idx, out) }
      val stored = phase("readIvfIndex") {
        GraftSimilarity.readIvfIndex(spark, out)
      }
      phase("q.count()") { queries.count() }
      val sem = phase("sem leg construction") {
        GraftSimilarity.ivfTopKWithQ8(stored,
          queries.select(col("q_id"), col("qv")), k = 30,
          nprobe = 4, rerankFactor = 4)
      }
      phase("sem leg exec (noop)") {
        sem.write.format("noop").mode("overwrite").save()
      }
      val served = phase("serve plan construction") {
        HybridRetrieval.hybridTopKWithQ8(
          stored, docs, queries,
          k = 10, kCand = 30, rrfK = 60, nprobe = 4, rerankFactor = 4)
      }
      phase("serve execution (noop)") {
        served.write.format("noop").mode("overwrite").save()
      }
      // lexical-shape A/B: tokenize+explode+tf fused with the scan (the
      // gated serve path today) vs fanned to session width first
      val qset = Seq("spark", "vector", "join", "the", "a", "data")
      def tfShape(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"),
                graft.operators.GraftText.whitespaceTokens(col("text"))
                  .as("__tk"))
        .select(col("doc_id"), size(col("__tk")).as("__dl"),
                explode(col("__tk")).as("__term"))
        .filter(col("__term").isin(qset: _*))
        .groupBy(col("doc_id"), col("__term"))
        .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
      phase("lex-shape fused (noop)") {
        tfShape(docs).write.format("noop").mode("overwrite").save()
      }
      phase("lex-shape fanned (noop)") {
        tfShape(docs.repartition(32))
          .write.format("noop").mode("overwrite").save()
      }
      // queries-subtree reuse: how much does one evaluation of the
      // docs⋈e minibatch derivation cost (it runs several times per
      // serve today)?
      phase("queries eval (noop)") {
        queries.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
