package graft

import org.apache.spark.sql.functions._
import graft.implicits._

/** Reference-equivalent test suite for the sample operator — the four tests
  * of `/root/reference/tests/e2e.rs` re-expressed for Spark (SURVEY §5):
  * execution determinism + statistics (golden rows can't transfer across
  * RNGs), the exact argument-validation matrix, and plan round-trips.
  */
class SampleSpec extends GraftFunSuite {
  import spark.implicits._

  // The reference's e2e input: select unnest([1..9,0]) (tests/e2e.rs:24).
  private def tenRows = spark.sql(
    "SELECT explode(array(1, 2, 3, 4, 5, 6, 7, 8, 9, 0)) AS a")

  test("same seed + same partitioning => identical output (e2e.rs:20-35 analog)") {
    val a = tenRows.sampleExt(0.5, Some(33L)).as[Int].collect().toSeq
    val b = tenRows.sampleExt(0.5, Some(33L)).as[Int].collect().toSeq
    assert(a == b)
    assert(a.toSet.subsetOf((0 to 9).toSet), "output must be a subset of input")
  }

  test("kept fraction within statistical bounds, schema preserved") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val n = li.count().toDouble
    for (f <- Seq(0.1, 0.5, 0.9)) {
      val sampled = li.sampleExt(f, Some(42L))
      assert(sampled.schema == li.schema)
      val k = sampled.count().toDouble
      // Chernoff-ish bound: 5 sigma on a binomial(n, f).
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(k - n * f) < 5 * sigma + 1,
        s"fraction=$f kept=$k expected=${n * f}")
    }
  }

  test("argument validation matrix (sample.rs:28-38 / e2e.rs:37-51)") {
    val df = tenRows
    intercept[IllegalArgumentException](df.sampleExt(0.0))
    intercept[IllegalArgumentException](df.sampleExt(-0.01))
    intercept[IllegalArgumentException](df.sampleExt(1.01))
    assert(df.sampleExt(1.0, Some(7L)).count() == 10) // fraction 1.0 accepted, keeps all
    intercept[IllegalArgumentException](df.sampleExt(0.5, Some(-1L)))
  }

  test("plan round-trip: custom node survives analyze->optimize->plan (e2e.rs:53-92 analog)") {
    val df = tenRows.sampleExt(0.5, Some(33L))
    val qe = org.apache.spark.sql.GraftSqlBridge.queryExecution(df)
    assert(qe.analyzed.toString.contains("GraftSample"),
      s"analyzed plan missing node:\n${qe.analyzed}")
    assert(qe.optimizedPlan.toString.contains("GraftSample"))
    assert(qe.executedPlan.toString.contains("GraftSampleExec"),
      s"physical plan missing exec:\n${qe.executedPlan}")
  }

  test("executes across multiple partitions and task serialization") {
    val df = spark.range(0, 100000, 1, 8).toDF("id").sampleExt(0.25, Some(9L))
    val k = df.count().toDouble
    assert(math.abs(k - 25000) < 5 * math.sqrt(100000 * 0.25 * 0.75))
    // determinism across runs with multiple partitions
    assert(df.agg(sum("id")).as[Long].head() ==
      spark.range(0, 100000, 1, 8).toDF("id").sampleExt(0.25, Some(9L))
        .agg(sum("id")).as[Long].head())
  }

  test("sampling adds no exchange: partitioning preserved") {
    val df = spark.range(0, 1000, 1, 4).toDF("id").sampleExt(0.5, Some(1L))
    val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(df).executedPlan
    assert(!plan.toString.contains("Exchange"),
      s"sample should not shuffle:\n$plan")
  }

  test("query surface parity: parquet dir scan + sql explode + collect/show") {
    // examples/datafusion.rs:26 — directory scan
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    assert(li.count() > 0)
    // tests/e2e.rs:24 — unnest/explode through SQL, then sample composes on it
    val rows = tenRows.sampleExt(0.5, Some(33L)).collect()
    assert(rows.forall(r => (0 to 9).contains(r.getInt(0))))
  }

  test("sample fuses into whole-stage codegen with its surroundings") {
    val df = spark.range(0, 1000, 1, 2).toDF("id").sampleExt(0.5, Some(5L))
      .agg(sum("id"))
    df.collect() // finalize the AQE plan so codegen stages are visible
    val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(df).executedPlan
    // the "*(n)" prefix marks WholeStageCodegen membership: the sampler must
    // share stage 1 with the range source and the partial aggregate
    assert(plan.toString.contains("*(1) GraftSampleExec"), plan.toString)
    // determinism preserved under the codegen path
    val a = df.collect().map(_.getLong(0)).toSeq
    val b = spark.range(0, 1000, 1, 2).toDF("id").sampleExt(0.5, Some(5L))
      .agg(sum("id")).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("optimizer rule pushes deterministic filters through the sample to the scan") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val df = li.sampleExt(0.5, Some(42L))
      .filter(col("l_discount") > 0.05)
      .select("l_orderkey", "l_discount")
    val qe = org.apache.spark.sql.GraftSqlBridge.queryExecution(df)
    // optimized plan: SampleNode sits ABOVE the pushed filter
    val opt = qe.optimizedPlan.toString
    assert(opt.indexOf("GraftSample") < opt.indexOf("Filter"), opt)
    // and the predicate reaches the parquet scan
    val phys = qe.executedPlan.toString
    assert(phys.contains("PushedFilters: [IsNotNull(l_discount), GreaterThan(l_discount"), phys)
    // result is still a valid sample of the filtered data
    val n = df.count().toDouble
    val total = li.filter(col("l_discount") > 0.05).count().toDouble
    assert(math.abs(n - total * 0.5) < 6 * math.sqrt(total * 0.25) + 1,
      s"kept $n of $total")
  }
}
