package graft.queries

import org.apache.spark.sql.functions._

/** Fourth relational battery: interval arithmetic, greatest/least, UNION
  * (distinct), LIMIT/OFFSET pagination, RANGE window frames, IN-subqueries,
  * CTEs, inline VALUES, and positional explode.
  */
object RelationalQueries4 extends QueryModule {

  override def all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_interval_arith",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
                  (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
                  (col("o_orderdate") - expr("INTERVAL 1 DAY")).as("day_before"),
                  datediff(lit("2002-01-01").cast("date"),
                           col("o_orderdate").cast("date")).cast("long")
                    .as("days_to_2002")),
      Some("""SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  o_orderdate - INTERVAL 1 DAY AS day_before,
        |  datediff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002
        |FROM orders""".stripMargin)),

    GraftQuery(
      "q_greatest_least",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
                  greatest(col("l_discount"), col("l_tax")).as("max_rate"),
                  least(col("l_discount"), col("l_tax")).as("min_rate")),
      Some("""SELECT l_orderkey, l_linenumber,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate
        |FROM lineitem""".stripMargin)),

    GraftQuery(
      "q_union_distinct",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct(),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin)),

    GraftQuery(
      "q_limit_offset",
      (s, dir) =>
        t(s, dir, "customer")
          .orderBy(asc("c_custkey"))
          .offset(20)
          .limit(10)
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 10 OFFSET 20""".stripMargin)),

    // RANGE frame: all orders within ±1000.0 of the current total price.
    GraftQuery(
      "q_window_range_frame",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
          .rangeBetween(-1000L, 1000L)
        t(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderkey"),
                  count("*").over(w).as("n_near"))
      },
      Some("""SELECT o_orderstatus, o_orderkey,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS n_near
        |FROM orders""".stripMargin)),

    GraftQuery(
      "q_in_subquery",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("graft_cust_in")
        t(s, dir, "orders").createOrReplaceTempView("graft_ord_in")
        s.sql("""SELECT c_custkey, c_name FROM graft_cust_in
                WHERE c_custkey IN (SELECT o_custkey FROM graft_ord_in
                                    WHERE o_totalprice > 300000)""")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 300000)""".stripMargin)),

    GraftQuery(
      "q_cte",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("graft_ord_cte")
        s.sql("""WITH totals AS (
                  SELECT o_custkey, sum(o_totalprice) AS total
                  FROM graft_ord_cte GROUP BY o_custkey),
                ranked AS (
                  SELECT o_custkey, round(total, 2) AS total,
                         CASE WHEN total > 1000000 THEN 'big' ELSE 'small' END
                           AS tier
                  FROM totals)
                SELECT tier, count(*) AS n, round(sum(total), 2) AS tier_total
                FROM ranked GROUP BY tier""")
      },
      Some("""WITH totals AS (
        |  SELECT o_custkey, sum(o_totalprice) AS total
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, round(total, 2) AS total,
        |         CASE WHEN total > 1000000 THEN 'big' ELSE 'small' END AS tier
        |  FROM totals)
        |SELECT tier, count(*) AS n, round(sum(total), 2) AS tier_total
        |FROM ranked GROUP BY tier""".stripMargin)),

    // GROUP BY ALL / ORDER BY ALL — the modern-SQL shorthand both engines
    // support (grouping keys inferred from the non-aggregate select list).
    GraftQuery(
      "q_group_by_all",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("graft_ord_gba")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                        round(sum(o_totalprice), 2) AS total
                FROM graft_ord_gba
                GROUP BY ALL ORDER BY ALL""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // Recursive CTE (Spark 4's WITH RECURSIVE) — iterative series expansion
    // anchored on table data; DuckDB evaluates the identical recursion.
    GraftQuery(
      "q_recursive_cte",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("graft_nat_rec")
        s.sql("""WITH RECURSIVE r(n) AS (
                  SELECT CAST(max(n_nationkey) AS BIGINT) FROM graft_nat_rec
                  UNION ALL
                  SELECT n - 1 FROM r WHERE n > 0)
                SELECT count(*) AS n_levels, sum(n) AS total FROM r""")
      },
      Some("""WITH RECURSIVE r(n) AS (
        |  SELECT CAST(max(n_nationkey) AS BIGINT) FROM nation
        |  UNION ALL
        |  SELECT n - 1 FROM r WHERE n > 0)
        |SELECT count(*) AS n_levels, CAST(sum(n) AS BIGINT) AS total
        |FROM r""".stripMargin)),

    GraftQuery(
      "q_values_inline",
      (s, _) =>
        s.sql("""SELECT category, count(*) AS n, sum(amount) AS total
                FROM VALUES ('a', 10L), ('b', 20L), ('a', 30L), ('c', 5L)
                     AS t(category, amount)
                GROUP BY category"""),
      Some("""SELECT category, count(*) AS n,
        |       CAST(sum(amount) AS BIGINT) AS total
        |FROM (VALUES ('a', CAST(10 AS BIGINT)), ('b', 20), ('a', 30), ('c', 5))
        |     AS t(category, amount)
        |GROUP BY category""".stripMargin)),

    GraftQuery(
      "q_posexplode",
      (s, _) =>
        s.sql("""SELECT pos, val FROM (
                  SELECT posexplode(array('x', 'y', 'z')) AS (pos, val))""")
          .select(col("pos").cast("long").as("pos"), col("val")),
      Some("""SELECT CAST(g.i - 1 AS BIGINT) AS pos, (['x', 'y', 'z'])[g.i] AS val
        |FROM generate_series(1, 3) g(i)""".stripMargin)),
  )
}
