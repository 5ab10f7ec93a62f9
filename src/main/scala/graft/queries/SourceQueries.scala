package graft.queries

import java.io.File
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface — the file-format capabilities in the reference's
  * wire vocabulary (SURVEY.md §2.3: CSV with dialect options, NDJSON,
  * writer options + compression, `/root/reference/proto/
  * datafusion_common.proto:411-544`). Each query round-trips driver testdata
  * through a format (write with options → read with explicit schema →
  * aggregate) so the DuckDB oracle certifies the whole read-write path, not
  * just the scan. Avro has no `spark-avro` connector in this build, so the
  * format is served by our own DataSourceV2 over the avro-core jar
  * (graft.sources.GraftAvroSource) — same oracle-checked roundtrip shape.
  *
  * Scale: writers partition output by task (one file per partition, standard
  * Spark layout); compression (gzip here) trades CPU for IO exactly as it
  * would at 100 TB.
  */
object SourceQueries extends QueryModule {

  /** DuckDB replay of `GraftSynthSource`'s (seed=42, id) draw — see the
    * `src_synth_scan` catalog entry for the numeric argument. Constants are
    * the unsigned-decimal forms of the splitmix64 / xorshift64* constants:
    * 0x9e3779b97f4a7c15, 0xbf58476d1ce4e5b9, 0x94d049bb133111eb,
    * 0x2545f4914f6cdd1d; 33554432 = 1 << 25; 2^-53 scales the top 53 bits
    * to [0, 1) exactly as `XorShift64Star.nextDouble`.
    */
  private val M64 = "18446744073709551616"
  private def mulmod(v: String, c: String): String =
    s"(((($v) // 4294967296) * $c) % $M64 * 4294967296) % $M64" +
    s" + ((($v) % 4294967296) * $c) % $M64"
  val synthScanOracle: String =
    s"""WITH ids AS (SELECT unnest(range(0, 100000)) AS id),
       |s0 AS (SELECT id, xor(42::HUGEINT, id::HUGEINT) AS v FROM ids),
       |z1 AS (SELECT id, (v + 11400714819323198485) % $M64 AS v FROM s0),
       |z1x AS (SELECT id, xor(v, v >> 30) AS v FROM z1),
       |z2 AS (SELECT id, (${mulmod("v", "13787848793156543929")}) % $M64 AS v FROM z1x),
       |z2x AS (SELECT id, xor(v, v >> 27) AS v FROM z2),
       |z3 AS (SELECT id, (${mulmod("v", "10723151780598845931")}) % $M64 AS v FROM z2x),
       |s AS (SELECT id, CASE WHEN xor(v, v >> 31) = 0 THEN 11400714819323198485
       |                      ELSE xor(v, v >> 31) END AS v FROM z3),
       |x1 AS (SELECT id, xor(v, v >> 12) AS v FROM s),
       |x2 AS (SELECT id, xor(v, (v * 33554432) % $M64) AS v FROM x1),
       |x3 AS (SELECT id, xor(v, v >> 27) AS v FROM x2),
       |r AS (SELECT id, (${mulmod("v", "2685821657736338717")}) % $M64 AS v FROM x3),
       |val AS (SELECT id, CAST(v >> 11 AS DOUBLE) * 1.1102230246251565e-16 * 100.0 AS value FROM r)
       |SELECT CAST(id % 16 AS INT) AS bucket, count(*) AS n,
       |  round(sum(value), 2) AS sum_value
       |FROM val GROUP BY 1""".stripMargin

  private def ioDir(dir: String, leaf: String): String =
    s"/tmp/graft_io/${new File(dir).getName}/$leaf"

  override def all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "src_csv_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "lineitem_csv")
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
          // gzip is NOT splittable: one output file = one writer thread AND
          // one reader task forever after. Round-robin into many moderate
          // files is the only parallel layout for non-splittable codecs —
          // the same layout decision a 100 TB corpus dump needs.
          .repartition(16)
          .write.mode("overwrite")
          // full dialect options: header, custom delimiter, quoting, gzip
          .option("header", "true").option("sep", ";")
          .option("quote", "'").option("compression", "gzip")
          .csv(out)
        val schema = StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_quantity", DoubleType),
          StructField("l_extendedprice", DoubleType),
          StructField("l_returnflag", StringType)))
        s.read.option("header", "true").option("sep", ";").option("quote", "'")
          .schema(schema).csv(out)
          .groupBy("l_returnflag")
          .agg(count("*").as("n"),
               round(sum(col("l_quantity")), 2).as("sum_qty"),
               round(sum(col("l_extendedprice")), 2).as("sum_price"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    GraftQuery(
      "src_json_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "orders_json")
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
          // same non-splittable-codec layout note as src_csv_roundtrip
          .repartition(16)
          .write.mode("overwrite")
          .option("compression", "gzip")
          .json(out)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_totalprice", DoubleType),
          StructField("o_orderstatus", StringType)))
        s.read.schema(schema).json(out)
          .groupBy("o_orderstatus")
          .agg(count("*").as("n"),
               round(sum(col("o_totalprice")), 2).as("total"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Avro container roundtrip through graft.sources.GraftAvroSource (the
    // reference's format vocabulary lists Avro; no spark-avro jar ships
    // here, so the source is built on avro-core directly). The oracle runs
    // the same aggregate over the original parquet — a hash match certifies
    // the write+read path is lossless.
    GraftQuery(
      "src_avro_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "supplier_avro")
        t(s, dir, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
          .write.mode("overwrite")
          .format("graft.sources.GraftAvroSource")
          .option("compression", "deflate")
          .save(out)
        s.read.format("graft.sources.GraftAvroSource").load(out)
          .groupBy("s_nationkey")
          .agg(count("*").as("n"),
               round(sum(col("s_acctbal")), 2).as("sum_bal"),
               min("s_name").as("first_name"))
      },
      Some("""SELECT s_nationkey, count(*) AS n,
        |  round(sum(s_acctbal), 2) AS sum_bal,
        |  min(s_name) AS first_name
        |FROM supplier GROUP BY s_nationkey""".stripMargin)),

    // Arrow IPC roundtrip through graft.sources.GraftArrowSource (the last
    // format in the reference's wire vocabulary: proto:95-96 lists ARROW;
    // Spark ships arrow-vector for Python interchange but no Arrow FILE
    // source, so this one is ours). Small batchSize exercises multi-batch
    // files; the oracle aggregates the original parquet — a hash match
    // certifies the write+read path is lossless.
    GraftQuery(
      "src_arrow_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "part_arrow")
        t(s, dir, "part")
          .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
          .write.mode("overwrite")
          .format("graft.sources.GraftArrowSource")
          .option("batchSize", "512")
          .save(out)
        s.read.format("graft.sources.GraftArrowSource").load(out)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
               sum(col("p_size").cast("long")).as("sum_size"),
               round(sum(col("p_retailprice")), 2).as("sum_price"),
               min("p_name").as("first_name"))
      },
      Some("""SELECT p_brand, count(*) AS n,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size,
        |  round(sum(p_retailprice), 2) AS sum_price,
        |  min(p_name) AS first_name
        |FROM part GROUP BY p_brand""".stripMargin)),

    // ORC roundtrip (Spark-native columnar format beside parquet). DuckDB
    // cannot read ORC, but the oracle doesn't need to: it runs the same
    // aggregate over the ORIGINAL parquet table, so a hash match certifies
    // the ORC write+read path is lossless end-to-end.
    GraftQuery(
      "src_orc_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "customer_orc")
        t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
          .write.mode("overwrite")
          .option("compression", "zlib")
          .orc(out)
        s.read.orc(out)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"),
               round(sum(col("c_acctbal")), 2).as("sum_bal"),
               min("c_name").as("first_name"))
      },
      Some("""SELECT c_nationkey, count(*) AS n,
        |  round(sum(c_acctbal), 2) AS sum_bal,
        |  min(c_name) AS first_name
        |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // XML roundtrip (Spark 4's integrated XML source — the last of the
    // classic interchange formats). DuckDB doesn't read XML, and doesn't
    // need to: the oracle aggregates the ORIGINAL parquet, so a hash match
    // certifies the XML write+read path is lossless end-to-end (same
    // stance as the ORC roundtrip).
    GraftQuery(
      "src_xml_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "region_xml")
        t(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite")
          .option("rootTag", "nations").option("rowTag", "nation")
          .xml(out)
        val schema = StructType(Seq(
          StructField("n_nationkey", LongType),
          StructField("n_name", StringType),
          StructField("n_regionkey", LongType)))
        s.read.option("rowTag", "nation").schema(schema).xml(out)
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n"), min("n_name").as("first_name"),
               sum("n_nationkey").as("key_sum"))
      },
      Some("""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY n_regionkey""".stripMargin)),

    // Plain text-line roundtrip (spark.read/write.text — the format raw
    // corpus dumps arrive in). Rows are serialized to delimited lines on
    // write and parsed back with split() on read; the oracle aggregates the
    // original table, so a hash match certifies serialize+parse round-trips.
    GraftQuery(
      "src_text_roundtrip",
      (s, dir) => {
        val out = ioDir(dir, "orders_text")
        t(s, dir, "orders")
          // double→string is Spark's shortest-round-trip representation, so
          // the parse back below recovers the EXACT input double — the line
          // format itself is lossless for this schema
          .select(concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
                            col("o_totalprice").cast("string")).as("value"))
          .write.mode("overwrite")
          .option("compression", "gzip")
          .text(out)
        s.read.text(out)
          .select(split(col("value"), "\\|").as("f"))
          .select(col("f").getItem(0).cast("long").as("o_orderkey"),
                  col("f").getItem(1).as("o_orderstatus"),
                  col("f").getItem(2).cast("double").as("o_totalprice"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
               round(sum(col("o_totalprice")), 2).as("total"),
               min("o_orderkey").as("min_key"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  min(o_orderkey) AS min_key
        |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Custom DataSourceV2 scan (graft.sources.GraftSynthSource):
    // deterministic generated rows, column pruning in the reader.
    // Oracle (hash-green since r7): the per-row draw is a pure function of
    // (seed=42, id) — splitmix64 avalanche then one xorshift64* step
    // (SampleExecNode.XorShift64Star) — which DuckDB replays exactly in
    // 64-bit modular arithmetic: values live as non-negative HUGEINTs,
    // 64-bit multiplies split at 2^32 so every intermediate fits 128 bits,
    // wraparound is an explicit % 2^64, and unsigned >>> is plain >> on the
    // non-negative representation. (k >> 11) < 2^53 is exact in a double
    // and the 2^-53 scale is a power of two, so per-row values are
    // bit-identical across engines; only the sum's addition order differs,
    // which round(·, 2) absorbs (same contract as every rounded-sum
    // oracle here). Same replay pattern as the LSH plane walk
    // (SimilarityQueries) and the Gear CDC boundaries (DedupQueries).
    GraftQuery(
      "src_synth_scan",
      (s, _) =>
        s.read.format("graft.sources.GraftSynthSource")
          .option("rows", "100000").option("partitions", "16")
          .load()
          .groupBy("bucket")
          .agg(count("*").as("n"), round(sum(col("value")), 2).as("sum_value")),
      Some(SourceQueries.synthScanOracle)),

    // Bucketed-table co-located join: both sides written bucketBy(8) on the
    // join key, so the sort-merge join consumes the tables' bucket layout
    // and needs NO shuffle of either side (PlanSpec pins zero Exchanges in
    // the join subtree). At 100 TB this is THE join strategy for repeated
    // fact-fact joins: pay the bucketed write once, join shuffle-free
    // forever after. hint("MERGE") keeps the plan on the sort-merge path
    // regardless of size estimates so the bucket layout is what's exercised.
    GraftQuery(
      "src_bucketed_join",
      (s, dir) => {
        val lOut = ioDir(dir, "bucketed/lineitem_b")
        val oOut = ioDir(dir, "bucketed/orders_b")
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", lOut).mode("overwrite").saveAsTable("g_lineitem_b")
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", oOut).mode("overwrite").saveAsTable("g_orders_b")
        s.table("g_lineitem_b").hint("MERGE")
          .join(s.table("g_orders_b"),
                col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
               round(sum(col("l_quantity")), 2).as("sum_qty"),
               min(col("o_totalprice")).as("min_total"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  min(o_totalprice) AS min_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin)),

    // Schema evolution across corpus snapshots: an early batch written
    // WITHOUT a column, a later batch WITH it, read back as one dataset
    // via mergeSchema — the drift shape every long-lived 100 TB corpus
    // accumulates (new metadata columns appear mid-corpus; old files
    // must keep reading, surfacing NULL for the new column). The oracle
    // replays the union with an explicit NULL for the missing column, so
    // the merged read's null semantics are hash-certified.
    GraftQuery(
      "src_schema_evolution",
      (s, dir) => {
        val out = ioDir(dir, "nation_evolving")
        val v1 = t(s, dir, "nation").select("n_nationkey", "n_name")
        val v2 = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .withColumn("n_nationkey", col("n_nationkey") + 100)
        v1.write.mode("overwrite").parquet(s"$out/batch=1")
        v2.write.mode("overwrite").parquet(s"$out/batch=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy(col("n_regionkey").isNull.as("legacy_rows"))
          .agg(count(lit(1)).as("n"),
               min("n_nationkey").as("min_key"),
               max("n_nationkey").as("max_key"))
      },
      Some("""WITH merged AS (
        |  SELECT n_nationkey, n_name, NULL::BIGINT AS n_regionkey
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name, n_regionkey FROM nation)
        |SELECT n_regionkey IS NULL AS legacy_rows, count(*) AS n,
        |  min(n_nationkey) AS min_key, max(n_nationkey) AS max_key
        |FROM merged GROUP BY 1""".stripMargin)),

    // Z-order (Morton) clustered layout: lineitem written range-partitioned
    // and sorted by the bit-interleaved z-value of two query axes, so
    // parquet row-group min/max stats are selective on BOTH columns — the
    // multi-dimensional data-skipping layout for 100 TB fact tables
    // ([[graft.operators.GraftLayout.zValue]]: pure integer bit
    // arithmetic, codegen'd, engine-identical). The box-predicate read
    // back is oracle-checked against the raw table, certifying the
    // clustered write is lossless and the predicate semantics unchanged.
    GraftQuery(
      "src_zorder_layout",
      (s, dir) => {
        import graft.operators.GraftLayout
        val out = ioDir(dir, "lineitem_zorder")
        val zx = col("l_orderkey") % 1024
        val zy = col("l_suppkey") % 1024
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
          .withColumn("z", GraftLayout.zValue(zx, zy, bits = 10))
          .repartitionByRange(8, col("z"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .filter(zx.between(100, 299) && zy.between(300, 499))
          .agg(count(lit(1)).as("n"),
               round(sum(col("l_quantity")), 2).as("sum_qty"),
               min("l_orderkey").as("min_key"))
      },
      Some("""SELECT count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  min(l_orderkey) AS min_key
        |FROM lineitem
        |WHERE l_orderkey % 1024 BETWEEN 100 AND 299
        |  AND l_suppkey % 1024 BETWEEN 300 AND 499""".stripMargin)),

    // Partitioned-parquet write + partition-pruned read: the layout that
    // carries 100 TB tables (pruning is asserted in PlanSpec).
    GraftQuery(
      "src_partitioned_parquet",
      (s, dir) => {
        val out = ioDir(dir, "lineitem_part")
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .write.mode("overwrite")
          .partitionBy("l_returnflag")
          .option("compression", "zstd")
          .parquet(out)
        s.read.parquet(out)
          .filter(col("l_returnflag") === "R")
          .groupBy("l_returnflag")
          .agg(count("*").as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag""".stripMargin)),
  )
}
