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

object GraftQuery {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize the `events.ts` column to a session-local µs TIMESTAMP
    * regardless of which generation of the driver testdata is on disk:
    *
    *   - parquet TIMESTAMP(NANOS) read as long ns (via
    *     `spark.sql.legacy.parquet.nanosAsLong`): integer-divide to µs —
    *     ns values ~1.7e18 overflow double precision, so no float path;
    *     gated by a plausibility check (value ≥ 1971 in ns) so a driver
    *     unit change to micros/millis-as-long raises instead of
    *     mis-scaling 1000×;
    *   - parquet TIMESTAMP(MICROS) without UTC adjustment (reads as
    *     TIMESTAMP_NTZ): reinterpret the naive value as a UTC instant via
    *     pure calendar arithmetic — `timestampdiff(MICROSECOND, ntz-epoch,
    *     ts)` is the naive value's exact as-if-UTC epoch offset, computed
    *     with NO timezone rules, so the result is the same instant under
    *     ANY session timezone (a bare cast shifts instants in non-UTC
    *     sessions, and even a convert_timezone round-trip through local
    *     wall time mis-resolves the DST fall-back fold hour), and agrees
    *     with DuckDB's `epoch_us` on the same naive timestamp;
    *   - already TIMESTAMP: pass through.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        // the long encoding is epoch-NANOseconds by contract; a driver-side
        // unit change (micros/millis-as-long) would silently mis-scale every
        // window 1000×+. Gate: epoch-ns for any instant ≥ 1971-01-01 is
        // ≥ 3.15e16, while epoch-MICROS stays below that until year ~2969
        // (and millis ~1e6× later) — so a unit drift fails loudly per-row
        // instead of shifting the data, matching the unsupported-type branch.
        val nsLo = 31536000000000000L // 1971-01-01T00:00:00Z in nanoseconds
        df.withColumn(tsCol, expr(
          s"""CASE WHEN $tsCol IS NULL THEN CAST(NULL AS TIMESTAMP)
             |WHEN $tsCol >= ${nsLo}L THEN timestamp_micros($tsCol div 1000)
             |ELSE raise_error(concat('events.$tsCol: long value ',
             |  CAST($tsCol AS STRING),
             |  ' is too small to be epoch-nanoseconds — unit drift',
             |  ' (micros/millis stored as long)?'))
             |END""".stripMargin))
      case TimestampNTZType =>
        df.withColumn(tsCol, expr(
          s"timestamp_micros(timestampdiff(MICROSECOND, " +
          s"TIMESTAMP_NTZ '1970-01-01 00:00:00', $tsCol))"))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events.$tsCol: unsupported type $other — expected long ns, " +
          "TIMESTAMP_NTZ µs, or TIMESTAMP")
    }
}

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

  /** The `events` table's `ts` physical type has varied across testdata
    * generations (TIMESTAMP(NANOS), naive TIMESTAMP(MICROS)); normalize to a
    * µs TIMESTAMP either way. See [[GraftQuery.normalizeTs]].
    */
  protected def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    GraftQuery.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
  }
}
