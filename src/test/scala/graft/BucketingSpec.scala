package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: pre-shuffled storage layouts let repeated
  * joins on the bucket key skip the exchange entirely — the 100 TB answer
  * to "the same join key every day". Also covers ScalaCheck-style seeded
  * property sweeps for the sampler.
  */
class BucketingSpec extends GraftFunSuite {

  test("bucketed-by-key tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // dirs persist — clear the physical locations too
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      val d = new java.io.File(s"/tmp/graft_wh/$t")
      if (d.exists()) {
        d.listFiles().foreach(_.delete())
        d.delete()
      }
    }
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_orders_b")
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_lineitem_b")
    val joined = spark.table("graft_orders_b")
      .join(spark.table("graft_lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("q"))
    // disable broadcast to force the join to prove bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(joined)
        .executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle the orders side:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle the lineitem side:\n$plan")
      // values equal the unbucketed join
      val expected = spark.read.parquet(s"$sf0001/orders.parquet")
        .join(spark.read.parquet(s"$sf0001/lineitem.parquet"),
              col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("sampler property sweep: bounds hold across fractions and seeds") {
    import graft.implicits._
    val n = 20000
    val base = spark.range(0, n, 1, 8).toDF("id")
    for (fraction <- Seq(0.05, 0.25, 0.5, 0.75, 0.95); seed <- Seq(1L, 7L, 123L)) {
      val kept = base.sampleExt(fraction, Some(seed)).count().toDouble
      val sigma = math.sqrt(n * fraction * (1 - fraction))
      assert(math.abs(kept - n * fraction) < 6 * sigma + 1,
        s"fraction=$fraction seed=$seed kept=$kept")
    }
  }
}
