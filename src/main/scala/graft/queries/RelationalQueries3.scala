package graft.queries

import org.apache.spark.sql.functions._

/** Third relational battery: extended string/regex functions, distribution
  * window functions (ntile, percent_rank, cume_dist), first/last frames,
  * bitwise aggregates, date-part extraction, cross join.
  */
object RelationalQueries3 extends QueryModule {

  override def all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_string_funcs2",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            lpad(col("p_brand"), 12, "*").as("brand_pad"),
            translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("name_masked"),
            regexp_extract(col("p_type"), "([A-Za-z]+)$", 1).as("type_last_word"),
            levenshtein(col("p_brand"), lit("Brand#00")).cast("long").as("brand_dist"),
            reverse(col("p_brand")).as("brand_rev")),
      Some("""SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
        |  coalesce(regexp_extract(p_type, '([A-Za-z]+)$', 1), '') AS type_last_word,
        |  levenshtein(p_brand, 'Brand#00') AS brand_dist,
        |  reverse(p_brand) AS brand_rev
        |FROM part""".stripMargin)),

    GraftQuery(
      "q_window_distribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderstatus")
          .orderBy("o_totalprice", "o_orderkey")
        t(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderkey"),
                  ntile(4).over(w).cast("long").as("quartile"),
                  round(percent_rank().over(w), 4).as("pct_rank"),
                  round(cume_dist().over(w), 4).as("cume"))
      },
      Some("""SELECT o_orderstatus, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin)),

    GraftQuery(
      "q_first_last",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
                  first(col("o_orderkey")).over(w).as("first_order"),
                  last(col("o_orderkey")).over(w).as("last_order"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)""".stripMargin)),

    GraftQuery(
      "q_bitwise_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(bit_and(col("l_partkey")).as("and_part"),
               bit_or(col("l_partkey")).as("or_part"),
               bit_xor(col("l_orderkey")).as("xor_order")),
      Some("""SELECT l_returnflag,
        |  bit_and(l_partkey) AS and_part,
        |  bit_or(l_partkey) AS or_part,
        |  bit_xor(l_orderkey) AS xor_order
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Day-of-week numbering differs across engines: Spark dayofweek is
    // 1=Sunday, DuckDB dayofweek is 0=Sunday — normalized to ISO (1=Monday).
    GraftQuery(
      "q_date_parts",
      (s, dir) =>
        t(s, dir, "orders")
          .select(dayofweek(col("o_orderdate")).as("dw"), col("o_totalprice"))
          .select(when(col("dw") === 1, 7L).otherwise(col("dw").cast("long") - 1)
                    .as("iso_dow"),
                  col("o_totalprice"))
          .groupBy("iso_dow")
          .agg(count("*").as("n"), round(sum(col("o_totalprice")), 2).as("total")),
      Some("""SELECT isodow(o_orderdate) AS iso_dow, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY isodow(o_orderdate)""".stripMargin)),

    GraftQuery(
      "q_cross_join",
      (s, dir) =>
        t(s, dir, "region").crossJoin(t(s, dir, "nation"))
          .select(col("r_name"), col("n_name"))
          .groupBy("r_name")
          .agg(count("*").as("n_combos")),
      Some("""SELECT r_name, count(*) AS n_combos
        |FROM region CROSS JOIN nation GROUP BY r_name""".stripMargin)),
  )
}
