package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Relational query surface — the engine capabilities the reference inherits
  * from DataFusion and demonstrably exercises (SURVEY.md §2.2/§2.3: parquet
  * scans, SQL, projections/aliases, the join-type vocabulary of
  * `/root/reference/proto/datafusion_common.proto:78-93`, aggregate and window
  * machinery), re-expressed Spark-first. Every query is declarative
  * DataFrame API: Catalyst handles pushdown, pruning, join selection, AQE.
  *
  * Scale notes (100 TB design):
  *   - dimension tables (region/nation/supplier/part/customer) are broadcast
  *     explicitly — fact-to-dim joins must never shuffle the fact side;
  *   - fact-fact joins (orders ⋈ lineitem) shuffle on the join key, which is
  *     the natural co-partitioning at any scale; AQE re-plans skew;
  *   - aggregates are partial-final (map-side combine) by construction since
  *     we only use declarative groupBy/agg.
  *
  * Determinism notes (DuckDB oracle hash-match): every ORDER BY carries a
  * unique tiebreak key; double aggregates of products are rounded to absorb
  * summation-order differences; derived int columns are cast to long to match
  * DuckDB's BIGINT outputs.
  */
object RelationalQueries extends QueryModule {

  private def li(s: SparkSession, dir: String) = t(s, dir, "lineitem")

  override def all: Seq[GraftQuery] = Seq(
    // ---- aggregation --------------------------------------------------
    GraftQuery(
      "q1_agg",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            sum("l_extendedprice").as("sum_base_price"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            avg("l_quantity").as("avg_qty"),
            avg("l_discount").as("avg_disc"),
            count("*").as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    GraftQuery(
      "q_agg_stats",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4)
              .as("corr_qp"),
            round(min(col("l_extendedprice")), 2).as("min_price"),
            round(max(col("l_extendedprice")), 2).as("max_price")),
      Some("""SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    GraftQuery(
      "q_distinct_agg",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey")).as("nd_supp"),
            count("*").as("n")),
      Some("""SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    GraftQuery(
      "q_rollup",
      (s, dir) =>
        li(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
               count("*").as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    GraftQuery(
      "q_having",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(round(sum(col("o_totalprice")), 2).as("total"),
               count("*").as("n_orders"))
          .filter(col("n_orders") >= 3),
      Some("""SELECT o_custkey, round(sum(o_totalprice), 2) AS total,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3""".stripMargin)),

    GraftQuery(
      "q_conditional_agg",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
              .as("n_discounted"),
            sum(when(col("l_tax") > 0.04, col("l_quantity")).otherwise(0.0))
              .as("qty_taxed"),
            count(when(col("l_quantity") > 25, 1)).as("n_bulk")),
      Some("""SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        |  sum(CASE WHEN l_tax > 0.04 THEN l_quantity ELSE 0.0 END) AS qty_taxed,
        |  count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- filter / sort / limit ---------------------------------------
    GraftQuery(
      "q_filter_topk",
      (s, dir) =>
        li(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                  col("l_discount") > 0.05)
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
          .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
                   asc("l_linenumber"))
          .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin)),

    // ---- joins --------------------------------------------------------
    GraftQuery(
      "q3_join_agg",
      (s, dir) =>
        t(s, dir, "orders")
          .join(li(s, dir), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
                 .as("revenue"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    GraftQuery(
      "q5_multi_join",
      (s, dir) => {
        // Fact side shuffles on join keys; all dims broadcast (≤ part-table
        // scale even at sf1000, region/nation are constant-size).
        val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        li(s, dir)
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "customer")),
                col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "supplier")),
                col("l_suppkey") === col("s_suppkey") &&
                col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, dir, "nation")),
                col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
                col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(round(sum(revenue), 2).as("revenue"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name""".stripMargin)),

    GraftQuery(
      "q_join_left",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
                "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin)),

    GraftQuery(
      "q_join_full",
      (s, dir) =>
        t(s, dir, "nation")
          .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"),
                "full")
          .select(col("n_nationkey"), col("n_name"), col("s_suppkey")),
      Some("""SELECT n_nationkey, n_name, s_suppkey
        |FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey""".stripMargin)),

    GraftQuery(
      "q_join_semi",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
                "left_semi")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    GraftQuery(
      "q_join_anti",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
                "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // ---- set operations ----------------------------------------------
    GraftQuery(
      "q_intersect",
      (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_acctbal") > 5000)
          .select("c_custkey")
          .intersect(t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))),
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin)),

    GraftQuery(
      "q_except",
      (s, dir) =>
        t(s, dir, "customer")
          .select("c_custkey")
          .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))),
      Some("""SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin)),

    GraftQuery(
      "q_union_all",
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_nationkey").as("nationkey"))
          .unionAll(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .groupBy("nationkey")
          .agg(count("*").as("n")),
      Some("""SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) GROUP BY nationkey""".stripMargin)),

    // ---- window functions --------------------------------------------
    GraftQuery(
      "q_window_rank",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("o_custkey", "o_orderkey", "rnk")
      },
      Some("""SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin)),

    GraftQuery(
      "q_window_running",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .withColumn("running_value", round(sum(col("value")).over(w), 4))
          .select("user_id", "event_id", "running_value")
      },
      Some("""SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS running_value
        |FROM events""".stripMargin)),

    GraftQuery(
      "q_window_lag",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir)
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("next_value", round(lead(col("value"), 1).over(w), 4))
          .select("user_id", "event_id", "prev_type", "next_value")
      },
      Some("""SELECT user_id, event_id,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_type,
        |  round(lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
        |    AS next_value
        |FROM events""".stripMargin)),

    // ---- scalar functions --------------------------------------------
    GraftQuery(
      "q_scalar_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 5).as("name5"),
            length(col("p_name")).cast("long").as("name_len"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            round(col("p_retailprice") * 1.1, 2).as("inflated"),
            abs(col("p_size") - 25).as("size_dev"),
            when(col("p_size") > 25, "big").otherwise("small").as("size_class")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 5) AS name5,
        |  length(p_name) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  round(p_retailprice * 1.1, 2) AS inflated,
        |  abs(p_size - 25) AS size_dev,
        |  CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class
        |FROM part""".stripMargin)),

    GraftQuery(
      "q_date_funcs",
      (s, dir) =>
        t(s, dir, "orders")
          .select(year(col("o_orderdate")).cast("long").as("y"),
                  month(col("o_orderdate")).cast("long").as("m"),
                  col("o_totalprice"))
          .groupBy("y", "m")
          .agg(count("*").as("n"), round(sum(col("o_totalprice")), 2).as("total")),
      Some("""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY year(o_orderdate), month(o_orderdate)""".stripMargin)),

    GraftQuery(
      "q_json_extract",
      (s, dir) =>
        events(s, dir)
          .select((get_json_object(col("props"), "$.k").cast("long") % 10)
                    .as("k_mod"),
                  col("value"))
          .groupBy("k_mod")
          // sum not avg: see events_hourly — rounded averages of 2-decimal
          // values knife-edge on exact .00005 halves across engines
          .agg(count("*").as("n"), round(sum(col("value")), 2).as("sum_value")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1""".stripMargin)),

    // Spark 4 VARIANT type: parse_json → open semi-structured cell →
    // variant_get typed extraction — the engine's native answer to
    // schema-on-read JSON (vs the string-walking get_json_object above).
    // The oracle extracts the same path with DuckDB's JSON machinery; the
    // typed value, not the variant encoding, is the contract.
    GraftQuery(
      "q_variant",
      (s, dir) =>
        events(s, dir)
          .select(expr("variant_get(parse_json(props), '$.k', 'long')")
                    .as("k"),
                  col("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
               min("k").as("min_k"), max("k").as("max_k")),
      Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |       AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin)),

    // ---- generators (reference e2e parity: unnest of an array literal,
    //      /root/reference/tests/e2e.rs:24) ------------------------------
    GraftQuery(
      "q_explode",
      (s, _) =>
        s.sql("SELECT explode(array(1, 2, 3, 4, 5, 6, 7, 8, 9, 0)) AS a"),
      Some("SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 0]) AS a")),

    GraftQuery(
      "q_explode_join",
      (s, dir) =>
        // generate one row per (order, day-offset) — Generate node feeding a join
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 100)
          .select(col("o_orderkey"),
                  explode(sequence(lit(1), lit(3))).as("day_offset")),
      Some("""SELECT o_orderkey, unnest([1, 2, 3]) AS day_offset
        |FROM orders WHERE o_orderkey < 100""".stripMargin)),
  )
}
