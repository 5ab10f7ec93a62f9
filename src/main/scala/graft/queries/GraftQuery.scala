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

  /** Size-gate for attach joins (candidate stream ⋈ per-row payload table).
    *
    * Broadcast the payload side only while Catalyst's size estimate stays
    * under `spark.graft.broadcastGateBytes` (default 256 MB — a per-executor
    * memory bound, not Spark's conservative 10 MB auto threshold); past the
    * gate, hint SHUFFLE_HASH so the join hash-builds on this side without
    * sorting the (much larger) probe stream, and no full-table broadcast
    * ever ships. At 100 TB a signature/embedding table is terabytes — the
    * gate makes the demo plan and the cluster plan the same code path
    * instead of an unconditional `broadcast()` that dies at scale.
    */
  protected def gated(side: DataFrame): DataFrame =
    pick(side, side.queryExecution.optimizedPlan.stats.sizeInBytes)

  /** Like `gated`, but decided by an exact byte size the caller measured
    * (e.g. count × row width of an already-persisted table). Catalyst's
    * estimate can flip across cache materialization, and a flipping join
    * strategy changes the partitioning seen downstream — fatal under a
    * position-seeded sampler that promises same-partitioning determinism.
    */
  protected def gatedExact(side: DataFrame, exactBytes: Long): DataFrame =
    pick(side, BigInt(exactBytes))

  private def pick(side: DataFrame, est: BigInt): DataFrame = {
    val gate = side.sparkSession.conf
      .getOption("spark.graft.broadcastGateBytes").map(_.toLong)
      .getOrElse(256L << 20)
    if (est <= gate) org.apache.spark.sql.functions.broadcast(side)
    else side.hint("SHUFFLE_HASH")
  }

  /** Ensure at least the session's default parallelism ahead of a heavy
    * per-row map stage (signature/gram computation). A benchmark-sized
    * corpus packs into one or two 128 MB read splits, which would run the
    * expensive compute on 1-2 cores; at real scale the input already has
    * more splits than cores and this is a no-op — no shuffle is added.
    */
  protected def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

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
