package graft

import org.apache.spark.sql.functions._

class FreqSketchSpec extends GraftFunSuite {
  import spark.implicits._

  private def corpus(nDistinct: Int, reps: Int => Int) =
    (0 until nDistinct).flatMap(i => Seq.fill(reps(i))(s"term_$i"))

  test("exact mode: estimates equal exact GROUP BY counts, is_exact " +
       "holds, and the result is invariant under partitioning") {
    val data = corpus(40, i => i + 1) // term_i appears i+1 times
    val expected = data.groupBy(identity).map { case (t, xs) =>
      (t, xs.length.toLong) }.toSet
    for (parts <- Seq(1, 8)) {
      val df = data.toDF("term").repartition(parts)
      val row = df.agg(expr("graft_freq_sketch(term, 256)").as("sk"))
        .select(expr("graft_freq_is_exact(sk)").as("ex"),
                expr("graft_freq_items(sk)").as("it")).head
      assert(row.getBoolean(0), "small corpus must stay in exact mode")
      val items = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(items.map(i => (i._1, i._2)).toSet === expected,
        s"parts=$parts")
      items.foreach { case (_, est, lb, ub) =>
        assert(lb === est && ub === est, "exact mode: lb = est = ub")
      }
    }
  }

  test("bounded tier past the purge threshold: is_exact false, every " +
       "true count inside [lb, ub], every true heavy hitter retained") {
    // 2000 distinct light terms (1×) + 5 heavy terms (300×) through a
    // tiny map — far past purge
    val heavy = (0 until 5).map(i => s"HH_$i")
    val data = corpus(2000, _ => 1) ++ heavy.flatMap(Seq.fill(300)(_))
    val truth = data.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    val row = data.toDF("term").repartition(4)
      .agg(expr("graft_freq_sketch(term, 64)").as("sk"))
      .select(expr("graft_freq_is_exact(sk)").as("ex"),
              expr("graft_freq_items(sk)").as("it")).head
    assert(!row.getBoolean(0), "purged sketch must report inexact")
    val items = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    items.foreach { case (t, _, lb, ub) =>
      val actual = truth.getOrElse(t, 0L)
      assert(lb <= actual && actual <= ub,
        s"$t: true $actual outside [$lb, $ub]")
    }
    val surfaced = items.map(_._1).toSet
    heavy.foreach { h =>
      assert(surfaced(h), s"true heavy hitter $h missing — " +
        "NO_FALSE_NEGATIVES guarantee broken")
    }
  }

  test("SQL reach: graft_freq_sketch family callable from spark.sql " +
       "after ensureExtensions") {
    GraftSession.ensureExtensions(spark)
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("freq_in")
    val r = spark.sql(
      """SELECT graft_freq_is_exact(sk) ex,
        |       size(graft_freq_items(sk)) n
        |FROM (SELECT graft_freq_sketch(t, 8) sk FROM freq_in)""".stripMargin)
      .head
    assert(r.getBoolean(0) && r.getInt(1) === 2)
  }
}
