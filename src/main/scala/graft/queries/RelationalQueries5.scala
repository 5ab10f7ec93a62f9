package graft.queries

import org.apache.spark.sql.functions._

/** Fifth relational battery: higher-order array functions as user-facing
  * operators (transform/filter/aggregate/flatten), map construction and
  * access — the LIST/MAP vocabulary of SURVEY.md §1.3. Array outputs are
  * serialized to csv strings for unambiguous cross-engine hashing.
  */
object RelationalQueries5 extends QueryModule {

  override def all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_array_hof",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
                  expr("sequence(1, l_linenumber)").as("arr"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            expr("array_join(transform(arr, x -> x * 2), ',')").as("doubled"),
            expr("array_join(filter(arr, x -> x % 2 = 0), ',')").as("evens"),
            expr("aggregate(arr, 0L, (acc, x) -> acc + x)").as("total"),
            expr("exists(arr, x -> x >= 4)").as("has_ge4"),
            size(expr("flatten(array(arr, arr))")).cast("long").as("flat_len")),
      Some("""SELECT l_orderkey, l_linenumber,
        |  coalesce(array_to_string(list_transform(
        |    [x FOR x IN range(1, l_linenumber + 1)], x -> x * 2), ','), '')
        |    AS doubled,
        |  coalesce(array_to_string(list_filter(
        |    [x FOR x IN range(1, l_linenumber + 1)], x -> x % 2 = 0), ','), '')
        |    AS evens,
        |  CAST(list_sum([x FOR x IN range(1, l_linenumber + 1)]) AS BIGINT)
        |    AS total,
        |  len(list_filter([x FOR x IN range(1, l_linenumber + 1)],
        |      x -> x >= 4)) > 0 AS has_ge4,
        |  CAST(2 * l_linenumber AS BIGINT) AS flat_len
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin)),

    GraftQuery(
      "q_map_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
                  map_from_arrays(
                    array(lit("size"), lit("double_size")),
                    array(col("p_size").cast("long"),
                          (col("p_size") * 2).cast("long"))).as("m"))
          .select(
            col("p_partkey"),
            element_at(col("m"), "size").as("size_val"),
            element_at(col("m"), "double_size").as("double_val"),
            array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
            size(col("m")).cast("long").as("n_entries")),
      Some("""SELECT p_partkey,
        |  CAST(p_size AS BIGINT) AS size_val,
        |  CAST(p_size * 2 AS BIGINT) AS double_val,
        |  array_to_string(list_sort(map_keys(
        |    map(['size', 'double_size'],
        |        [CAST(p_size AS BIGINT), CAST(p_size * 2 AS BIGINT)]))), ',')
        |    AS keys_csv,
        |  CAST(cardinality(map(['size', 'double_size'],
        |        [CAST(p_size AS BIGINT), CAST(p_size * 2 AS BIGINT)])) AS BIGINT)
        |    AS n_entries
        |FROM part""".stripMargin)),

    // Exact percentiles with linear interpolation (percentile / median —
    // the exact counterparts of q_approx_agg's sketches). Both engines use
    // the same rank formula p*(n-1) with linear interpolation; l_quantity
    // values are small exact doubles so the arithmetic is bitwise-stable.
    // One partial/final aggregation per group at any scale (the sort
    // happens inside the aggregate buffer, not as a global exchange).
    GraftQuery(
      "q_percentile_exact",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.75)").as("p75"),
            expr("median(l_extendedprice)").as("med_price"),
            count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  median(l_extendedprice) AS med_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Wide-to-long reshape via the Dataset.unpivot (melt) API — the
    // relational dual of q_pivot. Metrics are exact integer-valued doubles
    // (counts and sums of integral columns), so the value column
    // hash-matches across engines. The unpivot itself is a zero-shuffle
    // per-row expansion of the (tiny) aggregated frame.
    GraftQuery(
      "q_unpivot",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("n_rows"),
               sum(col("l_quantity")).as("sum_qty"),
               sum(col("l_linenumber").cast("double")).as("sum_line"))
          .unpivot(Array(col("l_returnflag")),
                   Array(col("n_rows"), col("sum_qty"), col("sum_line")),
                   "metric", "value"),
      Some("""WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n_rows,
        |    sum(l_quantity) AS sum_qty,
        |    sum(CAST(l_linenumber AS DOUBLE)) AS sum_line
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value
        |FROM w UNPIVOT (value FOR metric IN (n_rows, sum_qty, sum_line))""".stripMargin)),

    // Element-wise combination of two arrays (zip_with) plus slice and
    // reverse — the remaining LIST vocabulary of SURVEY.md §1.3 not covered
    // by q_array_hof. Pure map, zero shuffle.
    GraftQuery(
      "q_zip_with",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") < 100)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            expr("""array_join(zip_with(sequence(1, l_linenumber),
                   sequence(l_linenumber, 1, -1), (x, y) -> x * y), ',')""")
              .as("prods"),
            expr("array_join(slice(sequence(1, l_linenumber), 1, 2), ',')")
              .as("first2"),
            expr("array_join(reverse(sequence(1, l_linenumber)), ',')")
              .as("rev")),
      Some("""SELECT l_orderkey, l_linenumber,
        |  array_to_string([x * (l_linenumber + 1 - x)
        |                   FOR x IN range(1, l_linenumber + 1)], ',') AS prods,
        |  array_to_string(list_slice(
        |    [x FOR x IN range(1, l_linenumber + 1)], 1, 2), ',') AS first2,
        |  array_to_string(list_reverse(
        |    [x FOR x IN range(1, l_linenumber + 1)]), ',') AS rev
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    // each other instead of disappearing — the join a dedup-by-possibly-
    // missing-key pipeline needs. Still a hash-partitionable equi-join
    // (nulls hash to one partition), not a nested loop.
    GraftQuery(
      "q_null_safe_join",
      (s, dir) => {
        def side(maxKey: Long) =
          t(s, dir, "orders").filter(col("o_orderkey") < maxKey)
            .select(nullif(col("o_orderkey") % 5, lit(4)).as("k"),
                    col("o_orderkey"))
        val a = side(100).select(col("k"), col("o_orderkey").as("a_key"))
        val b = side(50).select(col("k").as("bk"), col("o_orderkey").as("b_key"))
        a.join(b, a("k") <=> b("bk"))
          .groupBy(coalesce(col("k"), lit(-1L)).as("key_or_null"))
          .agg(count(lit(1)).as("n_pairs"),
               min(col("a_key") + col("b_key")).as("min_sum"))
      },
      Some("""WITH a AS (
        |  SELECT NULLIF(o_orderkey % 5, 4) k, o_orderkey a_key
        |  FROM orders WHERE o_orderkey < 100),
        |b AS (
        |  SELECT NULLIF(o_orderkey % 5, 4) k, o_orderkey b_key
        |  FROM orders WHERE o_orderkey < 50)
        |SELECT coalesce(a.k, -1) AS key_or_null, count(*) AS n_pairs,
        |  min(a_key + b_key) AS min_sum
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY coalesce(a.k, -1)""".stripMargin)),

    // Boolean and filtered aggregates: count_if, bool_and/bool_or, and the
    // SQL-standard FILTER clause — predicate aggregation without CASE
    // gymnastics. One partial/final aggregation at any scale.
    GraftQuery(
      "q_bool_agg",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("graft_ord_bool")
        s.sql("""SELECT o_orderstatus,
                   count_if(o_totalprice > 100000) AS n_big,
                   count(*) FILTER (WHERE o_orderkey % 2 = 0) AS n_even,
                   bool_and(o_totalprice > 0) AS all_pos,
                   bool_or(o_orderkey % 97 = 0) AS any_97
                 FROM graft_ord_bool GROUP BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  count(*) FILTER (WHERE o_orderkey % 2 = 0) AS n_even,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_orderkey % 97 = 0) AS any_97
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Outer generator variants: explode_outer/posexplode_outer keep the
    // parent row (with null element) when the array is empty — the
    // left-join-shaped unnest that plain explode silently drops. The oracle
    // spells the same semantics by padding empty arrays with [NULL].
    GraftQuery(
      "q_explode_outer",
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 200)
          // orders with key % 3 == 0 get an EMPTY array
          .select(col("o_orderkey"),
                  when(col("o_orderkey") % 3 === 0, array().cast("array<long>"))
                    .otherwise(expr("sequence(1L, o_orderkey % 3)"))
                    .as("arr"))
          .select(col("o_orderkey"),
                  posexplode_outer(col("arr")).as(Seq("pos", "elem")))
          .select(col("o_orderkey"),
                  col("pos").cast("long").as("pos"), col("elem")),
      Some("""WITH a AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN []::BIGINT[]
        |         ELSE [x FOR x IN range(1, o_orderkey % 3 + 1)] END arr
        |  FROM orders WHERE o_orderkey < 200),
        |s AS (
        |  SELECT o_orderkey,
        |    CASE WHEN len(arr) = 0 THEN [{'pos': NULL, 'elem': NULL}]
        |         ELSE [{'pos': i - 1, 'elem': arr[i]}
        |               FOR i IN range(1, len(arr) + 1)] END st
        |  FROM a),
        |u AS (SELECT o_orderkey, unnest(st) AS u FROM s)
        |SELECT o_orderkey, CAST(u.pos AS BIGINT) AS pos,
        |  CAST(u.elem AS BIGINT) AS elem
        |FROM u""".stripMargin)),

    // LATERAL correlated subquery (SQL lateral join): a per-customer
    // aggregate computed by a subquery referencing the outer row — the
    // SQL-standard dual of the DataFrame groupBy+join. Catalyst
    // decorrelates it into a plain aggregate + join, so the executed plan
    // is one shuffle, not a per-row subquery execution.
    GraftQuery(
      "q_lateral",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("graft_cust_lat")
        t(s, dir, "orders").createOrReplaceTempView("graft_ord_lat")
        s.sql("""SELECT c.c_custkey, t.n_orders, t.total
                 FROM graft_cust_lat c,
                 LATERAL (SELECT count(o_orderkey) AS n_orders,
                                 round(sum(o_totalprice), 2) AS total
                          FROM graft_ord_lat o
                          WHERE o.o_custkey = c.c_custkey) t
                 WHERE c.c_custkey <= 200""")
      },
      Some("""SELECT c.c_custkey, t.n_orders, t.total
        |FROM customer c,
        |LATERAL (SELECT count(o_orderkey) AS n_orders,
        |                round(sum(o_totalprice), 2) AS total
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey) t
        |WHERE c.c_custkey <= 200""".stripMargin)),

    // Error-tolerant arithmetic: try_divide nulls on division by zero and
    // try_cast nulls on malformed input instead of failing the job — the
    // semantics a 100-TB pipeline needs when one dirty row must not kill a
    // stage. The oracle spells the same semantics with CASE/TRY_CAST.
    GraftQuery(
      "q_try_arith",
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderkey") < 1000)
          .select(
            col("o_orderkey"),
            try_divide(col("o_totalprice"), col("o_orderkey") % 3)
              .as("div3"),
            expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
            expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)")
              .as("prio_num")),
      Some("""SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |       ELSE o_totalprice / (o_orderkey % 3) END AS div3,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num
        |FROM orders WHERE o_orderkey < 1000""".stripMargin)),

    // Equi-width histogram — the distribution-profiling primitive (data
    // quality dashboards, drift monitors). Fixed bin bounds keep the bin
    // function a pure map (no min/max pre-pass) and floor of an exact
    // double division is engine-identical; the top bin is open-ended.
    // One partial/final aggregation at any scale.
    GraftQuery(
      "q_histogram",
      (s, dir) =>
        t(s, dir, "orders")
          .select(least(floor(col("o_totalprice") / 50000.0), lit(9L))
                    .cast("long").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"))
          .withColumn("lo", col("bin") * 50000.0)
          .withColumn("hi",
            when(col("bin") === 9L, lit(null).cast("double"))
              .otherwise((col("bin") + 1) * 50000.0)),
      Some("""SELECT bin, count(*) AS n, bin * 50000.0 AS lo,
        |  CASE WHEN bin = 9 THEN NULL ELSE (bin + 1) * 50000.0 END AS hi
        |FROM (SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT)
        |        AS bin FROM orders)
        |GROUP BY bin""".stripMargin)),
  )
}
