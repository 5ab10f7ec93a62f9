package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import graft.plans.SampleNode

/** User-facing API extensions — the analog of the reference's
  * `DataFrameExt` trait (`/root/reference/src/dataframe/sample.rs:11-52`).
  * `import graft.implicits._` to pick them up.
  */
object implicits {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Bernoulli row sample through the graft extension path.
      *
      * Validation matches the reference exactly
      * (`/root/reference/src/dataframe/sample.rs:28-38`):
      * `0 < fraction <= 1`, `seed >= 0`.
      */
    def sampleExt(fraction: Double, seed: Option[Long] = None): DataFrame = {
      if (fraction <= 0.0 || fraction > 1.0) {
        throw new IllegalArgumentException(
          s"sample fraction should be in (0, 1] range, got: $fraction")
      }
      seed.foreach { s =>
        if (s < 0) {
          throw new IllegalArgumentException(
            s"seed should be a positive value, got: $s")
        }
      }
      val spark = df.sparkSession
      GraftSession.ensureExtensions(spark)
      val resolvedSeed =
        seed.getOrElse(java.util.concurrent.ThreadLocalRandom.current().nextLong(Long.MaxValue))
      GraftSqlBridge.ofRows(
        spark,
        SampleNode(fraction, resolvedSeed, GraftSqlBridge.logicalPlan(df)))
    }
  }
}
