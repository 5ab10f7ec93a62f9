package graft

import org.apache.spark.sql.functions._

/** Custom DataSourceV2 (graft.sources.GraftSynthSource) behavior. */
class SourcesSpec extends GraftFunSuite {

  private def synth(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GraftSynthSource")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  test("generates the requested rows across the requested partitions") {
    val df = synth(1000, 8)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(countDistinct("id")).head().getLong(0) == 1000)
  }

  test("deterministic: same options produce identical data, independent of layout") {
    val a = synth(500, 4).orderBy("id").collect().toSeq
    val b = synth(500, 7).orderBy("id").collect().toSeq
    assert(a == b, "partition layout must not change row content")
  }

  test("column pruning reaches the reader (ReadSchema)") {
    val df = synth(100, 2).select("id", "bucket")
    val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(df)
      .executedPlan.toString
    // DSv2 renders the pruned output inline on the BatchScan node
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("[id#") && scanLine.contains("bucket#"), plan)
    assert(!scanLine.contains("value#") && !scanLine.contains("tag#"), plan)
  }

  test("composes with the engine: aggregate + custom sample over the source") {
    import graft.implicits._
    val agg = synth(10000, 8)
      .sampleExt(0.5, Some(3L))
      .groupBy("bucket").agg(count("*").as("n"))
    val total = agg.agg(sum("n")).head().getLong(0).toDouble
    assert(math.abs(total - 5000) < 6 * math.sqrt(10000 * 0.25))
    assert(agg.count() == 16)
  }

  // ---- graft.sources.GraftAvroSource ------------------------------------

  private val avroFmt = "graft.sources.GraftAvroSource"

  test("avro roundtrip preserves rows, schema, nulls, and float arrays") {
    import spark.implicits._
    val dir = "/tmp/graft_avro_spec/mixed"
    val df = Seq(
      (1L, Some("alpha"), 1.5, Array(1.0f, 2.0f), Array[Byte](1, 2, 3)),
      (2L, None, -0.25, Array(3.0f), Array[Byte]()),
      (3L, Some("gamma"), 0.0, Array.empty[Float], Array[Byte](9)))
      .toDF("id", "name", "score", "vec", "payload")
    df.write.mode("overwrite").format(avroFmt).save(dir)
    val back = spark.read.format(avroFmt).load(dir)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("name").nullable)
    assert(back.schema("vec").dataType.typeName == "array")
    // hex the binary column: Row.toString renders byte arrays by identity
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("payload", hex(col("payload")))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(df) == canon(back))
  }

  test("avro roundtrip over real testdata (embeddings incl. array<float>)") {
    val dir = "/tmp/graft_avro_spec/embeddings"
    val src = spark.read.parquet(s"$sf0001/embeddings.parquet")
    src.write.mode("overwrite").format(avroFmt)
      .option("compression", "snappy").save(dir)
    val back = spark.read.format(avroFmt).load(dir)
    assert(back.count() == src.count())
    val a = src.orderBy("vec_id").collect().map(_.toString).toSeq
    val b = back.orderBy("vec_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("avro reader prunes columns via the projected reader schema") {
    val dir = "/tmp/graft_avro_spec/embeddings"
    val df = spark.read.format(avroFmt).load(dir).select("vec_id")
    val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(df)
      .executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("vec_id#") && !scanLine.contains("embedding#"),
           plan)
    assert(df.distinct().count() == spark.read
      .parquet(s"$sf0001/embeddings.parquet").count())
  }

  test("avro sub-file splitting: one big file reads on many cores, losslessly") {
    import spark.implicits._
    val dir = "/tmp/graft_avro_spec/split"
    // one writer task → ONE container file with many sync-delimited blocks
    val n = 20000L
    spark.range(n).select(col("id"),
        concat(lit("padding-padding-padding-"), col("id")).as("txt"))
      .coalesce(1)
      .write.mode("overwrite").format(avroFmt)
      .option("compression", "none").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, s"expected one container file, got ${files.length}")
    assert(files(0).length() > 256 * 1024, "file too small to exercise splits")
    // default read: file splits into ≤128 MB chunks — tiny file, 1 partition
    val whole = spark.read.format(avroFmt).load(dir)
    // forced small splits: many partitions, same rows — every block consumed
    // by exactly one split (sync handoff), none dropped or doubled
    val split = spark.read.format(avroFmt)
      .option("maxSplitBytes", 64 * 1024).load(dir)
    assert(split.rdd.getNumPartitions > 4,
      s"only ${split.rdd.getNumPartitions} partitions")
    assert(split.count() == n)
    assert(split.select(countDistinct("id")).head().getLong(0) == n)
    assert(whole.orderBy("id").collect().toSeq ==
           split.orderBy("id").collect().toSeq)
  }

  test("avro write honors overwrite (truncate) semantics") {
    import spark.implicits._
    val dir = "/tmp/graft_avro_spec/trunc"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").format(avroFmt).save(dir)
    Seq((9L, "z")).toDF("k", "v")
      .write.mode("overwrite").format(avroFmt).save(dir)
    val back = spark.read.format(avroFmt).load(dir).collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(9L))
  }

  // ---- graft.sources.GraftArrowSource -----------------------------------

  private val arrowFmt = "graft.sources.GraftArrowSource"

  test("arrow roundtrip preserves rows, schema, nulls, arrays, timestamps") {
    import spark.implicits._
    val dir = "/tmp/graft_arrow_spec/mixed"
    val df = Seq(
      (1L, Some("alpha"), 1.5, Array(1.0f, 2.0f), Array[Byte](1, 2, 3),
       java.sql.Timestamp.valueOf("2024-01-01 10:00:00.000001")),
      (2L, None, -0.25, Array(3.0f), Array[Byte](),
       java.sql.Timestamp.valueOf("2024-06-15 23:59:59.999999")),
      (3L, Some("gamma"), 0.0, Array.empty[Float], Array[Byte](9),
       java.sql.Timestamp.valueOf("1999-12-31 00:00:00")))
      .toDF("id", "name", "score", "vec", "payload", "at")
    df.write.mode("overwrite").format(arrowFmt).save(dir)
    val back = spark.read.format(arrowFmt).load(dir)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("name").nullable)
    assert(back.schema("vec").dataType.typeName == "array")
    assert(back.schema("at").dataType.typeName == "timestamp")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("payload", hex(col("payload")))
        .collect().map(_.toString).sorted.toSeq
    assert(canon(df) == canon(back))
  }

  test("arrow roundtrip over real testdata (embeddings incl. array<float>)") {
    val dir = "/tmp/graft_arrow_spec/embeddings"
    val src = spark.read.parquet(s"$sf0001/embeddings.parquet")
    src.write.mode("overwrite").format(arrowFmt)
      .option("batchSize", "100").save(dir)
    val back = spark.read.format(arrowFmt).load(dir)
    assert(back.count() == src.count())
    val a = src.orderBy("vec_id").collect().map(_.toString).toSeq
    val b = back.orderBy("vec_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("arrow reader prunes columns at decode (ReadSchema)") {
    val dir = "/tmp/graft_arrow_spec/embeddings"
    val df = spark.read.format(arrowFmt).load(dir).select("vec_id")
    val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(df)
      .executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("vec_id#") && !scanLine.contains("embedding#"),
           plan)
    assert(df.distinct().count() == spark.read
      .parquet(s"$sf0001/embeddings.parquet").count())
  }

  test("arrow batch-granular splitting: one file reads on many cores, losslessly") {
    import spark.implicits._
    val dir = "/tmp/graft_arrow_spec/split"
    val n = 20000L
    // one writer task + small batches → one file with many record batches
    spark.range(n).select(col("id"),
        concat(lit("padding-padding-padding-"), col("id")).as("txt"))
      .coalesce(1)
      .write.mode("overwrite").format(arrowFmt)
      .option("batchSize", "1000").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length == 1, s"expected one IPC file, got ${files.length}")
    val whole = spark.read.format(arrowFmt).load(dir)
    val split = spark.read.format(arrowFmt)
      .option("maxSplitBytes", 64 * 1024).load(dir)
    assert(split.rdd.getNumPartitions > 4,
      s"only ${split.rdd.getNumPartitions} partitions")
    assert(split.count() == n)
    assert(split.select(countDistinct("id")).head().getLong(0) == n)
    assert(whole.orderBy("id").collect().toSeq ==
           split.orderBy("id").collect().toSeq)
  }

  test("maxRecordsPerFile bounds output file sizes (compaction control)") {
    // the knob that keeps 100-TB outputs from producing multi-GB files a
    // downstream reader can't split
    val out = "/tmp/graft_io/maxrec_test"
    spark.read.parquet(s"$sf001/orders.parquet")
      .coalesce(2)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000)
      .parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val total = spark.read.parquet(out).count()
    assert(files.length >= (total / 1000).toInt,
      s"expected >= ${total / 1000} files for $total rows, got ${files.length}")
    for (f <- files) {
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 1000, s"${f.getName} has $n rows > maxRecordsPerFile")
    }
  }
}
