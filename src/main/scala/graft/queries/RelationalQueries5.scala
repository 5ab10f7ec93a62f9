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
  )
}
