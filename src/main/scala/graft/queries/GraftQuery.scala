package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's surface: a DataFrame builder over the
  * driver testdata plus (when SQL-expressible) a DuckDB oracle. Column names
  * must match between the two — the driver's compare sorts columns by name
  * before hashing.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def all: Seq[GraftQuery]

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** See [[graft.operators.ScaleHints.gated]] — size-gated broadcast vs
    * SHUFFLE_HASH for attach joins.
    */
  protected def gated(side: DataFrame): DataFrame =
    graft.operators.ScaleHints.gated(side)

  /** See [[graft.operators.ScaleHints.gatedExact]]. */
  protected def gatedExact(side: DataFrame, exactBytes: Long): DataFrame =
    graft.operators.ScaleHints.gatedExact(side, exactBytes)

  /** See [[graft.operators.ScaleHints.spread]] — parallelism floor ahead of
    * heavy per-row map stages.
    */
  protected def spread(df: DataFrame): DataFrame =
    graft.operators.ScaleHints.spread(df)

  /** The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses by default. Read it as long ns and convert to a µs timestamp with
    * integer division (ns values ~1.7e18 overflow double precision, so no
    * floating-point path). DuckDB truncates ns→µs the same way on output.
    */
  protected def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
}
