package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Plan-quality gates — the 100 TB design assertions. Each test pins a
  * property of the physical plan that must survive refactoring: pushdown,
  * pruning, broadcast selection, partition pruning, shuffle counts.
  */
class PlanSpec extends GraftFunSuite {

  private def planOf(name: String): String =
    GraftSqlBridge.queryExecution(SparkEntry.queries(name)(spark, sf0001))
      .executedPlan.toString

  test("filters reach the parquet scan (PushedFilters)") {
    val p = planOf("q_filter_topk")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // limit+sort fused into TakeOrderedAndProject (no global sort)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("column pruning: text_stats reads only doc_id and text") {
    val p = planOf("text_stats")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("source"), read)
  }

  test("q5 multi-join broadcasts all dimension tables") {
    val p = planOf("q5_multi_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
  }

  test("LSH verify joins attach per-doc data via broadcast, not shuffle") {
    val p = planOf("dedup_minhash_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("partitioned write is partition-pruned on read") {
    // materialize the partitioned layout, then check the pruned scan
    SparkEntry.queries("src_partitioned_parquet")(spark, sf0001).collect()
    val pruned = spark.read
      .parquet(s"/tmp/graft_io/sf0.001/lineitem_part")
      .filter(col("l_returnflag") === "R")
    val p = GraftSqlBridge.queryExecution(pruned).executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"), p)
  }

  test("aggregations are partial/final (map-side combine present)") {
    val p = planOf("q1_agg")
    assert(p.contains("partial_"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"q1_agg should shuffle once (+AQE read), got:\n$p")
  }

  test("events pipeline shuffles once for the windowed aggregation") {
    val p = planOf("events_hourly")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange:\n$p")
  }
}
