package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import graft.plans.GraftExtensions

/** Session factory with the graft extensions installed and scale-sane
  * defaults for the local[32] harness (AQE on, shuffle partitions sized to
  * cores instead of the 200 default, UTC for oracle parity).
  */
object GraftSession {

  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      // Spark Connect endpoint support: lets remote clients ship the
      // LSample extension relation (static conf — must be present when the
      // SparkContext starts for the plugin registry to pick it up)
      .config("spark.connect.extensions.relation.classes",
              "graft.connect.SampleRelationPlugin")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def getOrCreate(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureExtensions(spark)
    spark
  }

  /** Install graft planning on a session we did not build (e.g. the driver's
    * Verify/Bench sessions). Idempotent.
    */
  def ensureExtensions(spark: SparkSession): Unit = {
    GraftSqlBridge.ensureStrategy(spark, graft.plans.GraftStrategy)
    GraftSqlBridge.ensureOptimizerRule(spark, graft.plans.PushFilterThroughSample)
    graft.functions.GraftFunctionRegistry.all.foreach { case (name, builder) =>
      GraftSqlBridge.ensureFunction(spark, name, builder)
    }
  }

  /** Read one of the driver-generated testdata tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
