package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot key's partition is split at runtime —
  * the complement to the manual salting pattern in `q_salted_agg`.
  */
class SkewSpec extends GraftFunSuite {

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 380k rows of key 0 (hot) + a uniform tail, joined to a small dim
      val fact = spark.range(0, 400000)
        .select(when(col("id") < 380000, 0L).otherwise(col("id") % 1000)
                  .as("k"),
                col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
                                            (col("id") * 2).as("v"))
      // global aggregate after the join: a groupBy on the join key would
      // forbid the skew split (it would break the reused partitioning)
      val joined = fact.join(dim, "k").agg(count("*").as("n"))
      // collect(), not head(): head() executes a separate limited plan and
      // would leave this QueryExecution un-finalized
      assert(joined.collect()(0).getLong(0) == 400000L)
      val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(joined)
        .executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
