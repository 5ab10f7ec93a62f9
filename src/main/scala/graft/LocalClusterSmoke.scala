package graft

import org.apache.spark.sql.functions._

/** The one distribution boundary classic Spark has that `local[n]` never
  * crosses: task closures serialized to SEPARATE executor JVMs.
  * `local-cluster[2,1,1024]` spins up a real standalone master + 2 workers,
  * each launching a CoarseGrainedExecutorBackend process — so this main
  * proves the custom operator/expression/aggregate stack survives real
  * closure serialization + executor-side class loading, which SURVEY §5
  * promised and `local[n]` (one JVM, no serde) cannot show.
  *
  * Run standalone (own JVM — a SparkContext is per-JVM and the test
  * suites share a local[4] one): LocalClusterSpec shells out to it and
  * asserts the LOCAL_CLUSTER_OK marker.
  */
object LocalClusterSmoke {
  def main(args: Array[String]): Unit = {
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")
    val spark = GraftSession.builder("local-cluster[2,1,1024]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.executor.memory", "1g")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.executor.extraJavaOptions", opens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      GraftSession.ensureExtensions(spark)
      // 0. tasks really run in separate executor JVMs (ids "0"/"1", never
      // "driver") — the precondition that makes everything below a serde
      // proof rather than a local[n] rerun
      val execIds = spark.range(0, 64, 1, 8).rdd
        .mapPartitions(_ => Iterator(org.apache.spark.SparkEnv.get.executorId))
        .distinct().collect().toSet
      require(!execIds.contains("driver") && execIds.nonEmpty,
        s"tasks ran in-process: $execIds")
      // 1. the custom SampleExec physical operator (CodegenSupport) ships
      // inside task closures and executes remotely
      import graft.implicits._
      val n = spark.range(0, 100000, 1, 8).toDF("id")
        .sampleExt(0.25, Some(9L)).count()
      require(math.abs(n - 25000) < 5 * math.sqrt(100000 * 0.25 * 0.75),
        s"sample count off: $n")
      // 2. custom codegen expressions compile and run in executor JVMs
      val doc = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val mh = doc
        .select(expr("graft_minhash(split(trim(text), '\\\\s+'), 16)").as("sig"))
        .select(expr("size(sig)").as("k")).agg(sum("k")).head().getLong(0)
      require(mh > 0, s"minhash: $mh")
      // 3. a TypedImperativeAggregate's partial states serialize across
      // the executor boundary and merge (partial on executors, final after
      // the exchange)
      val tk = spark.range(0, 1000, 1, 8)
        .select(lit(1L).as("q_id"), col("id").as("n_id"),
                (col("id") % 97).cast("double").as("c"))
        .groupBy("q_id").agg(expr("graft_topk(c, n_id, 5)").as("tk"))
        .select(expr("size(tk)")).head().getInt(0)
      require(tk == 5, s"topk: $tk")
      // 4. an end-to-end catalog query (shuffles, broadcasts, custom
      // exprs) against real testdata
      val rows = SparkEntry.queries("q3_join_agg")(spark, "/root/testdata/sf0.001")
        .count()
      require(rows > 0, s"q3: $rows")
      // 5. the media codec kernels run EXECUTOR-side: the mapPartitions
      // encode→decode chain (GraftMedia's static palette + per-thread
      // ImageWriter state must survive executor class loading) against a
      // pure-arithmetic driver-side replay of the sampled-frame pixel sum
      val mm = SparkEntry.queries("mm_frame_sample")(
          spark, "/root/testdata/sf0.001")
        .agg(sum("sampled_px_sum")).head().getLong(0)
      val mmExpected = doc.select("text").collect().map { r =>
        r.getString(0).getBytes("UTF-8").zipWithIndex.collect {
          case (b, i) if (i / 256) % 4 == 0 => (b & 0xff).toLong
        }.sum
      }.sum
      require(mm == mmExpected, s"media: $mm != $mmExpected")
      println(s"LOCAL_CLUSTER_OK executors=${execIds.toSeq.sorted.mkString(",")} " +
        s"sample=$n minhashSigSum=$mh topk=$tk q3Rows=$rows mediaPxSum=$mm")
    } finally spark.stop()
  }
}
