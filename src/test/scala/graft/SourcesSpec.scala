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
}
