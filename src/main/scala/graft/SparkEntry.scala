package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.implicits._
import graft.queries._

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

  /** All query modules, each covering one slice of SURVEY.md §2 + the
    * training-data-pipeline operator set.
    */
  def modules: Seq[QueryModule] = Seq(
    SampleQueries,
    RelationalQueries,
    RelationalQueries2,
    RelationalQueries3,
    RelationalQueries4,
    RelationalQueries5,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries,
    EventQueries,
    SourceQueries,
    PipelineQueries,
    GraphQueries,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.all).map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (RNG
    * sampling, LSH signatures) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.all).collect {
      case GraftQuery(name, _, Some(sql)) => name -> sql
    }.toMap
}

/** The reference's own operator — Bernoulli sampling through the custom
  * Catalyst path (SURVEY.md §2.1). RNG-based → no SQL oracle; determinism
  * and statistics are covered by SampleSpec.
  */
object SampleQueries extends QueryModule {
  override def all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "sample_bernoulli",
      (s, dir) => {
        GraftSession.ensureExtensions(s)
        t(s, dir, "lineitem")
          .sampleExt(0.3, Some(42L))
          .groupBy("l_returnflag")
          .agg(count("*").as("n"))
      },
      None),
  )
}
