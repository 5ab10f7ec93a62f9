package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.implicits._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a `queries` entry; where the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle in `oracleSql`
  * hash-checks it (column names must match exactly — the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises the full custom path: parquet scan → graft Bernoulli sample
    * (custom SampleNode/SampleExecNode) → aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.ensureExtensions(spark)
    t(spark, "/root/testdata/sf0.001", "lineitem")
      .sampleExt(0.3, Some(42L))
      .groupBy("l_returnflag")
      .agg(count("*").as("n"), sum("l_quantity").as("sum_qty"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style aggregation — core groupBy/agg surface.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          avg("l_discount").as("avg_disc"),
          count("*").as("count_order"))
    }),

    // Graft Bernoulli sample through the custom Catalyst path. RNG-based →
    // no SQL oracle (driver records rows-only); determinism + statistics are
    // covered by SampleSpec.
    "sample_bernoulli" -> ((s, dir) => {
      GraftSession.ensureExtensions(s)
      t(s, dir, "lineitem")
        .sampleExt(0.3, Some(42L))
        .groupBy("l_returnflag")
        .agg(count("*").as("n"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
