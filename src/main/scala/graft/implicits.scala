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

    /** Leakage-free train/test split: rows are routed by a hash of the key
      * column, so every row with the same key lands on the same side —
      * the correct split for training data (no near-duplicate leakage
      * across the boundary when keyed by document/group id). Deterministic,
      * partitioning-independent, and exactly complementary.
      */
    def splitByHash(keyCol: String, trainFraction: Double,
                    seed: Long = 42L): (DataFrame, DataFrame) = {
      if (trainFraction <= 0.0 || trainFraction >= 1.0) {
        throw new IllegalArgumentException(
          s"train fraction should be in (0, 1) range, got: $trainFraction")
      }
      import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
      val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(1000))
      val cut = (trainFraction * 1000).toInt
      (df.filter(bucket < cut), df.filter(bucket >= cut))
    }
  }
}
