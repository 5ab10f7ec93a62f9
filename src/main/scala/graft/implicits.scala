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

    /** AS-OF join: enrich each left row with the payload of the latest
      * right row whose `rightTime` is at or before the left row's
      * `leftTime`, per `on` key (trade-vs-quote, purchase-vs-click
      * attribution, slowly-changing enrichment).
      *
      * Spark has no asof operator; a range join would generate a
      * candidate pair per (left row × earlier right row). This instead
      * unions the two sides and carries the right payload forward with
      * `last(_, ignoreNulls)` over an ordered per-key window — ONE
      * shuffle on the key, linear work, no pair blowup. At equal
      * timestamps the right row counts (ASOF `>=` semantics) and
      * `rightOrder` breaks ties among right rows (last one wins); pass
      * a unique column there for fully deterministic output.
      *
      * Output: every left column, then each non-key right column
      * renamed `prefix + name` (including `rightTime` — the matched
      * timestamp), null when no prior right row exists.
      */
    def asofJoin(right: DataFrame, on: Seq[String], leftTime: String,
                 rightTime: String, prefix: String = "asof_",
                 rightOrder: Seq[String] = Nil): DataFrame = {
      import org.apache.spark.sql.functions.{col, lit, last}
      require(on.nonEmpty, "asofJoin needs at least one key column")
      val leftFields = df.schema.fields.filterNot(f => on.contains(f.name))
      val payload = right.schema.fields.filterNot(f => on.contains(f.name))
      val clash = payload.map(prefix + _.name).toSet
        .intersect(df.columns.toSet)
      require(clash.isEmpty, s"prefixed right columns clash with left: $clash")

      val keyCols = on.map(col)
      val timeType = df.schema(leftTime).dataType
      val lSide = df.select(keyCols ++
        Seq(col(leftTime).cast(timeType).as("__t"), lit(1).as("__tag")) ++
        leftFields.map(f => col(f.name)) ++
        payload.map(f => lit(null).cast(f.dataType).as(prefix + f.name)): _*)
      val rSide = right.select(keyCols ++
        Seq(col(rightTime).cast(timeType).as("__t"), lit(0).as("__tag")) ++
        leftFields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
        payload.map(f => col(f.name).as(prefix + f.name)): _*)

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols: _*)
        .orderBy((Seq(col("__t"), col("__tag")) ++
                  rightOrder.map(c => col(prefix + c)) ++
                  leftFields.map(f => col(f.name))): _*)
        .rowsBetween(Long.MinValue, 0)

      payload.foldLeft(lSide.unionAll(rSide)) { (acc, f) =>
          acc.withColumn(prefix + f.name,
            last(col(prefix + f.name), ignoreNulls = true).over(w))
        }
        .filter(col("__tag") === 1)
        .select(df.columns.toIndexedSeq.map(col) ++
                payload.map(f => col(prefix + f.name)): _*)
    }

    /** Binned range join: every row of `points` whose `pointCol` value lies
      * in this frame's [startCol, endCol] interval (inclusive both ends),
      * joined without a quadratic pair blowup. Intervals explode to the
      * fixed-width bins they cover, a point maps to exactly ONE bin, and
      * the join is an equi-join on the bin plus an exact containment
      * filter — so a point meets only intervals whose bins it shares, and
      * no post-join dedup is needed.
      *
      * A raw inequality join would plan as a broadcast-nested-loop — the
      * classic 100-TB killer for interval joins. Here the shuffle is an
      * equi-join keyed by bin; pick `binWidth` near the typical interval
      * length so intervals explode to O(1) bins each. Bin ids use floor
      * division, so negative domains bin correctly. Column names of the
      * two frames must be disjoint.
      */
    def rangeJoinBinned(points: DataFrame, startCol: String, endCol: String,
                        pointCol: String, binWidth: Long): DataFrame = {
      import org.apache.spark.sql.functions.{col, explode, floor, sequence}
      require(binWidth > 0, s"binWidth must be positive, got $binWidth")
      val clash = df.columns.toSet.intersect(points.columns.toSet)
      require(clash.isEmpty, s"column names must be disjoint, both have: $clash")
      val binned = df.withColumn("__bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
      val p = points.withColumn("__bin",
        floor(col(pointCol) / binWidth).cast("long"))
      binned.join(p, "__bin")
        .filter(col(pointCol) >= col(startCol) &&
                col(pointCol) <= col(endCol))
        .drop("__bin")
    }

    /** Leakage-free train/test split routed on md5-hex of the key: a row
      * goes to train iff the first 4 hex chars of md5(key) fall under
      * floor(trainFraction · 16⁴). Same guarantees as [[splitByHash]]
      * (per-key routing, disjoint, complementary, partitioning-independent)
      * plus CROSS-ENGINE determinism — md5 of the decimal string form is
      * identical in any engine, so the split is reproducible outside Spark
      * (and DuckDB-oracle-checkable). Granularity is 1/65536 — fractions
      * under that are rejected (they would silently yield an empty train
      * side); prefer [[splitByHash]] (xxhash64 — cheaper per row) when the
      * split only ever needs to be reproduced inside Spark. NULL keys hash
      * a sentinel, so they route to ONE side like any other key value and
      * the complete+disjoint guarantee holds for them too.
      */
    def splitByHexHash(keyCol: String, trainFraction: Double)
        : (DataFrame, DataFrame) = {
      if (trainFraction <= 0.0 || trainFraction >= 1.0) {
        throw new IllegalArgumentException(
          s"train fraction should be in (0, 1) range, got: $trainFraction")
      }
      if ((trainFraction * 65536).toInt < 1) {
        throw new IllegalArgumentException(
          s"train fraction below the 1/65536 routing granularity: $trainFraction")
      }
      import org.apache.spark.sql.functions.{coalesce, col, lit, md5, substring}
      val route = substring(
        md5(coalesce(col(keyCol).cast("string"), lit("\u0000null-key"))), 1, 4)
      val cut = f"${(trainFraction * 65536).toInt min 65535}%04x"
      (df.filter(route < cut), df.filter(route >= cut))
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
