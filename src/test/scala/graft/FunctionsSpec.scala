package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.{GraftMinHash, GraftSigAgree, GraftSimHash}

/** Unit tests for the native codegen expressions (graft.functions). */
class FunctionsSpec extends GraftFunSuite {
  import spark.implicits._

  private def lit(ss: Seq[String]) =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      ss, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))

  test("minhash: interpreted eval matches codegen path") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("x", "y")),
      (3L, Seq.empty[String])).toDF("id", "toks")
    val fromDf = docs
      .select(col("id"), graft.functions.GraftFunctionRegistry.minhash(col("toks"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((id, toks) <- Seq(1L -> Seq("a b c", "b c d", "c d e"),
                           2L -> Seq("x", "y"), 3L -> Seq.empty[String])) {
      val interp = GraftMinHash(lit(toks), 32).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      assert(interp.toSeq == fromDf(id), s"id=$id")
    }
    // empty set → sentinel signature
    assert(fromDf(3L).forall(_ == Long.MaxValue))
  }

  test("minhash: signature agreement estimates Jaccard") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (41 to 140).map(i => s"sh$i") // |∩|=60, |∪|=140 → J≈0.4286
    val df = Seq((a, b)).toDF("a", "b")
      .select(expr("graft_sig_agree(graft_minhash(a, 512), graft_minhash(b, 512))").as("est"))
    val est = df.as[Double].head()
    assert(math.abs(est - 60.0 / 140.0) < 0.08, s"est=$est")
  }

  test("simhash: identical inputs agree; near sets have small hamming distance") {
    val base = (1 to 80).map(i => s"tok$i")
    val near = base.drop(4) ++ Seq("x1", "x2", "x3", "x4")
    val far = (1 to 80).map(i => s"other$i")
    val Seq(h1, h2, h3, h4) = Seq(base, base, near, far).map { s =>
      GraftSimHash(lit(s)).eval(null).asInstanceOf[Long]
    }
    assert(h1 == h2)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(h1, h3) < ham(h1, h4),
      s"near=${ham(h1, h3)} far=${ham(h1, h4)}")
    assert(ham(h1, h3) <= 16)
  }

  test("SQL registration via extensions: graft_* callable from spark.sql") {
    GraftSession.ensureExtensions(spark)
    val r = spark.sql(
      """SELECT size(graft_minhash(array('a','b'), 16)) AS k,
        |       graft_simhash(array('a','b')) AS sh,
        |       graft_sig_agree(array(1L, 2L), array(1L, 3L)) AS agree""".stripMargin)
      .head()
    assert(r.getInt(0) == 16)
    assert(r.getDouble(2) == 0.5)
  }

  test("type checking rejects wrong input types") {
    GraftSession.ensureExtensions(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_minhash(array(1, 2), 8)").head())
    assert(e.getMessage.contains("array<string>"))
  }

  test("whole-stage codegen keeps the expression in a codegen stage") {
    GraftSession.ensureExtensions(spark)
    val df = spark.range(100).selectExpr("graft_simhash(array(cast(id AS string))) AS h")
    val plan = org.apache.spark.sql.GraftSqlBridge.queryExecution(df).executedPlan
    // the "*(n)" stage prefix marks operators fused into WholeStageCodegen
    assert(plan.toString.contains("*(1) Project [graft_simhash"), plan.toString)
    assert(df.distinct().count() == 100)
  }

  test("graft_srp_sig: generated code COMPILES with fallback disabled and " +
       "matches interpreted eval through the shared plane cache") {
    GraftSession.ensureExtensions(spark)
    // fallback=false turns a codegen compile failure (e.g. the static
    // forwarder call into the plane cache breaking) into a hard error
    // instead of a silent interpreted fallback — the perf contract IS the
    // codegen path, so it must fail loudly
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val df = spark.range(8)
        .selectExpr(
          // hash-derived components so rows point in distinct directions
          // (scalar multiples of one vector would share every sign bit)
          "transform(sequence(0, 63), i -> cast(xxhash64(id * 64 + i) % 1000 AS double)) AS v")
        .selectExpr("v", "graft_srp_sig(v, 12, 3) AS s")
      val plan = org.apache.spark.sql.GraftSqlBridge
        .queryExecution(df).executedPlan.toString
      // the projection carrying graft_srp_sig must sit INSIDE a
      // WholeStageCodegen stage (the "*(n)" prefix)
      val sigLine = plan.linesIterator
        .find(_.contains("graft_srp_sig(")).getOrElse("")
      assert(sigLine.trim.startsWith("*("), plan)
      val rows = df.collect()
      // interpreted twin evaluates through the same cached plane matrix
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      rows.foreach { r =>
        val interp = graft.functions.GraftSrpSig(
            Literal.create(r.getSeq[Double](0), ArrayType(DoubleType)),
            Literal(12), Literal(3)).eval(null)
        assert(interp == r.getLong(1), s"row $r")
      }
      // distinct inputs produce distinct signatures here (sanity that the
      // cache isn't serving one row's projection to every row)
      assert(rows.map(_.getLong(1)).distinct.length > 1)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("minhash_agg over exploded rows equals scalar minhash of the distinct set") {
    GraftSession.ensureExtensions(spark)
    val toks = Seq("alpha", "beta", "gamma", "beta", "delta")
    val agg = toks.toDF("t")
      .agg(expr("graft_minhash_agg(t, 64)").as("sig"))
      .head().getSeq[Long](0)
    val scalar = Seq(toks.distinct).toDF("ts")
      .select(expr("graft_minhash(ts, 64)"))
      .head().getSeq[Long](0)
    assert(agg == scalar)
  }

  test("minhash_agg merges across partitions (partial/final) consistently") {
    GraftSession.ensureExtensions(spark)
    val df = spark.range(0, 10000, 1, 8)
      .selectExpr("cast(id % 500 AS string) AS t")
    val sig8 = df.agg(expr("graft_minhash_agg(t, 128)")).head().getSeq[Long](0)
    val sig1 = df.coalesce(1).agg(expr("graft_minhash_agg(t, 128)"))
      .head().getSeq[Long](0)
    assert(sig8 == sig1, "signature must be partitioning-invariant")
  }

  test("source-signature query estimates Jaccard within sketch error") {
    GraftSession.ensureExtensions(spark)
    val est = SparkEntry.queries("dedup_source_signature")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // exact shingle-set jaccard per source pair
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), expr("split(trim(text), '\\s+')").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(tk) - 3),
           i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))""")).as("g"))
      .distinct()
    val sets = sh.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(est.nonEmpty)
    for (((a, b), e) <- est) {
      val exact = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
      assert(math.abs(e - exact) < 0.15, s"($a,$b) est=$e exact=$exact")
    }
  }

  test("null handling: null inputs yield null, null elements are skipped") {
    GraftSession.ensureExtensions(spark)
    val r = spark.sql(
      """SELECT graft_minhash(CAST(NULL AS ARRAY<STRING>), 8) AS a,
        |       graft_simhash(CAST(NULL AS ARRAY<STRING>)) AS b,
        |       graft_sig_agree(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c,
        |       graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    // null ELEMENTS are skipped, not propagated
    val withNullElem = spark.sql(
      "SELECT graft_simhash(array('a', CAST(NULL AS STRING), 'b')) AS h").head()
    val withoutNull = spark.sql(
      "SELECT graft_simhash(array('a', 'b')) AS h").head()
    assert(withNullElem.getLong(0) == withoutNull.getLong(0))
  }

  test("cosine expression equals the HOF formulation bitwise") {
    GraftSession.ensureExtensions(spark)
    val df = spark.sql(
      """SELECT graft_cosine(a, b) AS native,
        |  aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
        |  / (sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))
        |   * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x))) AS hof
        |FROM (SELECT transform(sequence(1, 64), i -> cast(i AS double) / 7.0) a,
        |             transform(sequence(1, 64), i -> cast(i * i AS double) / 11.0) b)""".stripMargin)
      .head()
    assert(df.getDouble(0) == df.getDouble(1), "must be bitwise identical")
  }

  test("graft_cosine: dim mismatch throws on both codegen and interpreted paths") {
    GraftSession.ensureExtensions(spark)
    // codegen path (whole-stage over a DataFrame)
    val eCg = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D)) AS c")
        .head()
    }
    assert(eCg.getMessage.contains("vector lengths differ") ||
           Option(eCg.getCause).exists(_.getMessage.contains("vector lengths differ")),
           s"codegen path: $eCg")
    // interpreted eval path
    def dlit(xs: Seq[Double]) =
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        xs, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
    val eIn = intercept[IllegalArgumentException] {
      graft.functions.GraftCosine(dlit(Seq(1.0, 2.0, 3.0)), dlit(Seq(1.0, 2.0))).eval(null)
    }
    assert(eIn.getMessage.contains("vector lengths differ"))
    // equal lengths still fine on both paths
    assert(graft.functions.GraftCosine(dlit(Seq(1.0, 0.0)), dlit(Seq(1.0, 0.0)))
      .eval(null).asInstanceOf[Double] == 1.0)
  }

  test("graft_topk equals the sort-based top-k on randomized data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(500) / 100.0, i.toLong)
    }
    // sort-based reference: per key, top-5 by (score desc, id asc)
    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(r => (-r._2, r._3)).take(5).map(r => (r._2, r._3))
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("q_id", "c", "n_id").repartition(parts)
        .groupBy("q_id")
        .agg(org.apache.spark.sql.functions.expr("graft_topk(c, n_id, 5)").as("tk"))
        .collect()
        .map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getDouble(0), x.getLong(1)))
        }.toMap
      assert(got.keySet == expect.keySet)
      for ((k, e) <- expect) assert(got(k) == e, s"parts=$parts key=$k")
    }
  }

  test("graft_topk tie rule: equal scores resolve to the lower id") {
    import spark.implicits._
    val got = Seq((1L, 0.5, 9L), (1L, 0.5, 3L), (1L, 0.5, 7L), (1L, 0.9, 5L))
      .toDF("k", "c", "id")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.expr("graft_topk(c, id, 2)").as("tk"))
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(got == Seq((0.9, 5L), (0.5, 3L)), got.toString)
  }

  test("theta sketch: exact mode below 2^lgK, set algebra, partition-merge") {
    import spark.implicits._
    // two overlapping sets, both far below 2^12 distinct ⇒ EXACT mode:
    // estimates are exact counts, intersection included
    val rows = (1 to 300).map(i => ("a", s"item$i")) ++
               (201 to 500).map(i => ("b", s"item$i"))
    val sk = rows.toDF("src", "item")
      .repartition(7) // force partial/final merge across partitions
      .groupBy("src").agg(expr("graft_theta_sketch(item)").as("sk"))
    val est = sk.as("x").join(sk.as("y"), col("x.src") < col("y.src"))
      .selectExpr("graft_theta_est(x.sk)", "graft_theta_est(y.sk)",
                  "graft_theta_intersect_est(x.sk, y.sk)")
      .head()
    assert(est.getDouble(0) == 300.0, est)
    assert(est.getDouble(1) == 300.0, est)
    assert(est.getDouble(2) == 100.0, est) // items 201..300 shared
    // duplicates don't inflate the distinct estimate
    val dup = (rows ++ rows).toDF("src", "item").repartition(5)
      .groupBy("src").agg(expr("graft_theta_est(graft_theta_sketch(item))"))
      .collect().map(_.getDouble(1)).sorted
    assert(dup.toSeq == Seq(300.0, 300.0))
    // past exact mode the estimate stays within the sketch error envelope
    val big = (1 to 60000).map(i => s"x$i").toDF("item")
      .selectExpr("graft_theta_est(graft_theta_sketch(item, 12))")
      .head().getDouble(0)
    assert(math.abs(big - 60000) / 60000 < 0.05, s"estimate $big")
    // validation: lgK bounds
    intercept[IllegalArgumentException] {
      graft.functions.GraftThetaAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 30)
    }
    // graft_theta_is_exact: the exactness-precondition gate — true below
    // the sketch's capacity, false once it samples (the r9 guard that
    // protects dedup_source_overlap_exact's set-algebra oracle)
    val exactFlags = Seq(
      (1 to 300).map(i => s"s$i"),     // far below 2^12
      (1 to 60000).map(i => s"x$i"))   // far past it
      .map(_.toDF("item")
        .selectExpr("graft_theta_is_exact(graft_theta_sketch(item, 12))")
        .head().getBoolean(0))
    assert(exactFlags == Seq(true, false), exactFlags)
  }

  test("graft_q8: int8 range, max |component| hits ±127, half-away rounding") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0, -1.0, 0.5, 0.0)),      // symmetric ends
      (2L, Array(0.0, 0.0)),                 // zero vector → all zeros
      (3L, Array(-2.0, 1.0)),                // negative max-abs component
      (4L, Array(127.0, 0.5)))               // 0.5·127/127 = 0.5 → away = 1
      .toDF("id", "v")
      .select(col("id"), expr("graft_q8(v)").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(rows(1L) == Seq(127, -127, 64, 0))   // 63.5 rounds away to 64
    assert(rows(2L) == Seq(0, 0))
    assert(rows(3L) == Seq(-127, 64))           // scale from |−2|; 63.5 → 64
    assert(rows(4L) == Seq(127, 1))             // 0.5 → 1 (away, not even)
    // interpreted eval equals codegen
    val interp = graft.functions.GraftQ8(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq(1.0, -1.0, 0.5, 0.0),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    assert(interp.toSeq == rows(1L))
  }

  test("graft_q8_cos: exact on parallel/orthogonal, strict on length, 0 on zero") {
    import spark.implicits._
    def q8cos(a: Seq[Int], b: Seq[Int]): Double =
      Seq((a, b)).toDF("a", "b")
        .select(expr("graft_q8_cos(a, b)")).as[Double].head()
    assert(q8cos(Seq(3, 4), Seq(3, 4)) == 1.0)
    assert(q8cos(Seq(1, 0), Seq(0, 1)) == 0.0)
    assert(q8cos(Seq(1, 0), Seq(-1, 0)) == -1.0)
    assert(q8cos(Seq(0, 0), Seq(5, 5)) == 0.0) // zero norm → defined 0
    val e = intercept[Exception] { q8cos(Seq(1, 2, 3), Seq(1, 2)) }
    assert(e.getMessage.contains("lengths differ") ||
           Option(e.getCause).exists(_.getMessage.contains("lengths differ")))
    // quantized estimate tracks the true cosine on real embeddings
    val est = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(200)
      .selectExpr("transform(embedding, x -> cast(x AS double)) AS v")
      .selectExpr(
        "graft_q8_cos(graft_q8(v), graft_q8(reverse(v))) AS approx",
        "graft_cosine(v, reverse(v)) AS exact")
      .selectExpr("max(abs(approx - exact)) AS err").as[Double].head()
    assert(est < 0.02, s"max quantization error $est")
  }

  test("graft_q8b / graft_q8b_cos: byte packing equals the int kernel " +
       "bit-for-bit; one byte per component at rest") {
    import spark.implicits._
    // one quantization contract, two encodings: the packed bytes must
    // hold exactly graft_q8's ints, and the byte-cos must score exactly
    // like the int-cos, on real embeddings
    val checked = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(200)
      .selectExpr("transform(embedding, x -> cast(x AS double)) AS v")
      .selectExpr(
        "graft_q8(v) AS qi",
        "graft_q8b(v) AS qb",
        "graft_q8_cos(graft_q8(v), graft_q8(reverse(v))) AS ci",
        "graft_q8b_cos(graft_q8b(v), graft_q8b(reverse(v))) AS cb")
      .collect()
    for (r <- checked) {
      val qi = r.getSeq[Int](0)
      val qb = r.getAs[Array[Byte]](1)
      assert(qb.length == qi.length, "one byte per component")
      assert(qb.map(_.toInt).toSeq == qi, "packed bytes must equal the ints")
      assert(r.getDouble(2) == r.getDouble(3),
        "byte-cos must equal int-cos bitwise")
    }
    // contracts match the int kernel: zero vector → zero bytes → cos 0;
    // length mismatch throws
    val z = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
      .selectExpr("graft_q8b_cos(graft_q8b(a), graft_q8b(b)) AS c")
      .as[Double].head()
    assert(z == 0.0)
    val e = intercept[Exception] {
      Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
        .selectExpr("graft_q8b_cos(graft_q8b(a), graft_q8b(b)) AS c")
        .as[Double].head()
    }
    assert(e.getMessage.contains("lengths differ") ||
           Option(e.getCause).exists(_.getMessage.contains("lengths differ")))
  }

  test("graft_vec_sum: element-wise sum across partitions, nulls, floats") {
    import spark.implicits._
    // 100 vectors of dim 3 scattered over 7 partitions — forces partial
    // buffers to merge; exact because the components are small integers
    val df = spark.range(0, 100).repartition(7)
      .selectExpr("id % 4 AS g",
                  "array(cast(id AS double), 1.0d, cast(id % 2 AS double)) AS v")
    val got = df.groupBy("g").agg(expr("graft_vec_sum(v)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (g <- 0L until 4L) {
      val ids = (0L until 100L).filter(_ % 4 == g)
      assert(got(g) == Seq(ids.sum.toDouble, 25.0,
                           ids.count(_ % 2 == 1).toDouble), s"g=$g: ${got(g)}")
    }
    // null vectors are ignored; an all-null group evals to null
    val withNulls = Seq(
      (0L, Some(Seq(1.0, 2.0))), (0L, None), (1L, None))
      .toDF("g", "v")
    val n = withNulls.groupBy("g").agg(expr("graft_vec_sum(v)").as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(n(0L) == Seq(1.0, 2.0) && n(1L) == null, n.toString)
    // float arrays are accepted (the embeddings table's element type)
    val f = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
      .agg(expr("graft_vec_sum(embedding)").as("s"))
      .selectExpr("size(s)").as[Int].head()
    assert(f > 0)
    // mismatched lengths fail fast instead of mis-summing
    val e = intercept[Exception] {
      Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
        .agg(expr("graft_vec_sum(v)")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("length")), e.toString)
  }

  test("graft_normalize: NFC composes, NFKC folds compatibility, ASCII is identity") {
    import java.text.Normalizer
    GraftSession.ensureExtensions(spark)
    // decomposed a+U+0300 / o+U+0301 compose to single code points
    val df = Seq("ca\u0300t o\u0301", "plain ascii", "\ufb01ne").toDF("t")
    val nfc = df.selectExpr("graft_normalize(t)").as[String].collect()
    assert(nfc(0) == "c\u00e0t \u00f3", nfc(0))
    assert(nfc(0).getBytes("UTF-8").length <
           "ca\u0300t o\u0301".getBytes("UTF-8").length)
    assert(nfc(1) == "plain ascii")
    assert(nfc(2) == "\ufb01ne") // NFC keeps the ligature
    // NFKC folds the fi ligature to two letters
    val nfkc = df.selectExpr("graft_normalize(t, 'NFKC')").as[String].collect()
    assert(nfkc(2) == "fine", nfkc(2))
    // interpreted eval path agrees with the codegen path and the JDK
    for (s0 <- Seq("ca\u0300t o\u0301", "plain", "\ufb01ne", "")) {
      val interp = graft.functions.GraftNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s0),
          org.apache.spark.sql.types.StringType), "NFC").eval(null).toString
      assert(interp == Normalizer.normalize(s0, Normalizer.Form.NFC), s0)
    }
    // nulls propagate; a bad form fails at construction, not per row
    assert(Seq[Option[String]](None).toDF("t")
      .selectExpr("graft_normalize(t)").collect().head.isNullAt(0))
    val bad = intercept[Exception](
      df.selectExpr("graft_normalize(t, 'NFX')").collect())
    assert(bad.getMessage.contains("NFX") ||
           Option(bad.getCause).exists(_.getMessage.contains("NFX")), bad.toString)
  }

  test("builtin xxhash64 is XXH64.hashUnsafeBytes at seed 42 (the DSIR oracle contract)") {
    // pipeline_dsir_select's DuckDB replay runs the XxHash64Sql chain at
    // seed 42 assuming Spark's builtin xxhash64(string) IS the same
    // kernel the chain was fuzz-verified against; pin that equivalence.
    import org.apache.spark.unsafe.types.UTF8String
    for (s0 <- Seq("a", "key order", "the fast key order sort table scan",
                   "x" * 127, "")) {
      val viaDf = Seq(s0).toDF("t").selectExpr("xxhash64(t)").as[Long].head()
      val u = UTF8String.fromString(s0)
      val viaKernel = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      assert(viaDf == viaKernel, s0)
    }
  }

  test("graft_vec_sum_long: exact Int64 sums across partitions, int input " +
       "widens, nulls skip, overflow is loud") {
    graft.GraftSession.ensureExtensions(spark)
    val big = (1L << 61)
    val rows = Seq(Some(Seq(1L, big)), None, Some(Seq(2L, big)),
                   Some(Seq(3L, 0L)))
    val out = rows.toDF("v").repartition(3)
      .agg(expr("graft_vec_sum_long(v)")).as[Seq[Long]].head()
    assert(out == Seq(6L, 2L * big), "exact past 2^53 where doubles round")
    val ints = Seq(Seq(1, 2), Seq(3, 4)).toDF("v")
      .agg(expr("graft_vec_sum_long(v)")).as[Seq[Long]].head()
    assert(ints == Seq(4L, 6L))
    val boom = intercept[org.apache.spark.SparkException] {
      Seq(Seq(Long.MaxValue), Seq(1L)).toDF("v").repartition(1)
        .agg(expr("graft_vec_sum_long(v)")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(boom).exists(_.contains("overflow")),
      chain(boom).mkString(" | "))
    // all-null group evals to NULL, matching SQL sum
    val nul = Seq(Option.empty[Seq[Long]]).toDF("v")
      .agg(expr("graft_vec_sum_long(v)")).collect()(0)
    assert(nul.isNullAt(0))
  }

  test("gramMatrix: hand-computed triangle on a 3-vector corpus; " +
       "centered covariance recovers exactly from (sxy, sx, sy, n)") {
    import graft.operators.GraftSimilarity
    // grid 4: q rows = (4,8), (8,4), (4,4)
    val vecs = Seq(Seq(1.0, 2.0), Seq(2.0, 1.0), Seq(1.0, 1.0)).toDF("v")
    val g = GraftSimilarity.gramMatrix(vecs, "v", grid = 4L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
                           (r.getLong(2), r.getLong(3), r.getLong(4),
                            r.getLong(5)))).toMap
    // sxy: (0,0)=16+64+16=96, (0,1)=32+32+16=80, (1,1)=64+16+16=96
    // sx: s0=16, s1=16
    assert(g((0L, 0L)) == ((96L, 16L, 16L, 3L)), g.toString)
    assert(g((0L, 1L)) == ((80L, 16L, 16L, 3L)))
    assert(g((1L, 1L)) == ((96L, 16L, 16L, 3L)))
    assert(g.size == 3, "upper triangle of d=2 has 3 entries")
    // centered covariance (n·sxy − sx·sy): var0 = 3·96−256 = 32,
    // cov01 = 3·80−256 = −16 — the anti-correlation is visible exactly
    val (sxy01, sx0, sy1, n) = g((0L, 1L))
    assert(n * sxy01 - sx0 * sy1 == -16L)
    intercept[IllegalArgumentException] {
      GraftSimilarity.gramMatrix(vecs, "v", grid = 1000L) // not a power of 2
    }
  }

  test("graft_jaro_winkler: kernel equals the DuckDB-pinned reference " +
       "values bit-for-bit (window, half transpositions, 0.7-gated " +
       "prefix boost, empty/no-match zeros)") {
    // every expected value read off DuckDB jaro_winkler_similarity —
    // the semantics contract the text_jw_linkage oracle relies on
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // transpositions + boost
      ("dixon", "dicksonx", 0.8133333333333332),  // unequal lengths
      ("jellyfish", "smellyfish", 0.8962962962962964), // no common prefix
      ("crate", "trace", 0.7333333333333334),     // boost gate: jaro > 0.7
                                                  // but prefix 0
      ("abcqqqqqq", "abczzzzzz", 0.5555555555555555), // jaro ≤ 0.7: NO boost
                                                  // despite prefix 3
      ("ab", "abcdefghijk", 0.7818181818181817),  // short vs long window
      ("dwayne", "duane", 0.8400000000000001),
      ("abcd", "acbd", 0.9249999999999999),       // single transposition
      ("abcdefgh", "hgfedcba", 0.5),              // reversal
      ("xy", "yx", 0.0),                          // window 0 ⇒ no matches
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("", "", 0.0), ("a", "b", 0.0))
    for ((a, b, want) <- cases) {
      val got = spark.sql(
        s"SELECT graft_jaro_winkler('$a', '$b') j").collect().head.getDouble(0)
      assert(got == want, s"jw('$a','$b') = $got, want $want")
      // symmetry
      val rev = spark.sql(
        s"SELECT graft_jaro_winkler('$b', '$a') j").collect().head.getDouble(0)
      assert(rev == want, s"jw must be symmetric: jw('$b','$a') = $rev")
    }
    // null-safety (typed null — an untyped NULL literal is a type error)
    val n = spark.sql(
      "SELECT graft_jaro_winkler(CAST(NULL AS string), 'x') j")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("graft_mmr SQL form: decimal / double / int lambda literals all " +
       "parse (0.5 is DecimalType in Spark SQL — ADVICE r13), wrong " +
       "literal types report a TYPE error (not 'got 3 args'), and a " +
       "zero-norm candidate is refused loudly") {
    GraftSession.ensureExtensions(spark)
    def ids(lam: String): Seq[Long] = spark.sql(
      s"""SELECT graft_mmr(array(
         |  struct(1L, 0.9D, array(1D, 0D, 0D)),
         |  struct(2L, 0.8D, array(0D, 1D, 0D)),
         |  struct(3L, 0.7D, array(0D, 0D, 1D))), 2, $lam) AS m""".stripMargin)
      .selectExpr("transform(m, s -> s.id) AS ids")
      .head().getSeq[Long](0).toSeq
    // orthogonal candidates: every diversity penalty is 0, so selection
    // is relevance order at any positive lambda — (1, 2) for all three
    // literal spellings of the same value
    assert(ids("0.5") == Seq(1L, 2L))   // DecimalType literal (the fix)
    assert(ids("0.5D") == Seq(1L, 2L))  // DoubleType literal (always worked)
    assert(ids("1") == Seq(1L, 2L))     // IntegerType literal → 1.0
    def failMsg(body: => Any): String = {
      val t = intercept[Throwable](body)
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    }
    // wrong literal TYPE names the offending argument...
    assert(failMsg(ids("'x'")).contains("lambda must be a numeric literal"),
      failMsg(ids("'x'")))
    // ...and wrong ARITY still reports arity
    assert(failMsg(spark.sql(
        "SELECT graft_mmr(array(struct(1L, 0.9D, array(1D))), 2)")
        .collect()).contains("got 2 args"))
    // zero-norm candidate: cos() would be NaN and the NaN-frozen penalty
    // would force-select the candidate from pick 2 on — refused instead
    // (the probeCells stance, applied to candidates; ADVICE r13)
    val z = failMsg(spark.sql(
      """SELECT graft_mmr(array(
        |  struct(1L, 0.9D, array(1D, 0D)),
        |  struct(2L, 0.1D, array(0D, 0D))), 2, 0.5D)""".stripMargin)
      .collect())
    assert(z.contains("zero-norm"), z)
  }

  // --------------------------------------------------------------------
  // r17 (ADVICE r16): interpreted-eval vs whole-stage-codegen vs the
  // documented HOF fold, on the edge inputs the oracle's happy path
  // never exercises — NaN cosine (zero-norm centroid), c_id value ties,
  // empty centroid array, and null elements in graft_idot.
  // --------------------------------------------------------------------

  /** The exact HOF fold [[graft.functions.GraftArgmaxCos]] documents
    * bit-equivalence with (non-null centroid elements — the call-site
    * precondition: collect_list never emits null elements). */
  private val argmaxFoldSql =
    """aggregate(
      |  transform(cents, c -> struct(graft_cosine(v, c.cv) AS cc,
      |                               c.c_id AS c_id)),
      |  CAST(NULL AS STRUCT<cc: DOUBLE, c_id: BIGINT>),
      |  (acc, s) -> CASE
      |    WHEN acc IS NULL THEN s
      |    WHEN s.cc > acc.cc OR (isnan(s.cc) AND NOT isnan(acc.cc)) THEN s
      |    WHEN acc.cc > s.cc OR (isnan(acc.cc) AND NOT isnan(s.cc)) THEN acc
      |    WHEN s.c_id < acc.c_id THEN s ELSE acc END).c_id""".stripMargin

  test("graft_argmax_cos: codegen, interpreted eval and the documented " +
       "HOF fold agree on NaN/tie/empty edge inputs") {
    GraftSession.ensureExtensions(spark)
    // rows: (v, cents) covering — plain winner; zero-norm centroid (NaN
    // cosine ranks GREATEST); exact value tie (lowest c_id wins); ids
    // deliberately out of order; empty centroid array (NULL out)
    val rows = Seq(
      // distinct cosines: cents 7 (aligned) beats 3 (orthogonal)
      (Seq(1.0, 0.0), Seq((7L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))),
      // zero-norm centroid → NaN cosine → claims the row over id 1
      (Seq(1.0, 0.0), Seq((1L, Seq(1.0, 0.0)), (9L, Seq(0.0, 0.0)))),
      // two NaNs tie → lowest c_id (9 vs 4 → 4)
      (Seq(1.0, 0.0), Seq((9L, Seq(0.0, 0.0)), (4L, Seq(0.0, 0.0)))),
      // exact value tie (identical centroids) → lowest c_id
      (Seq(1.0, 1.0), Seq((5L, Seq(2.0, 2.0)), (2L, Seq(4.0, 4.0)))),
      // empty centroid set → NULL
      (Seq(1.0, 0.0), Seq.empty[(Long, Seq[Double])]))
    val df = rows.toDF("v", "raw")
      .selectExpr("v",
        "transform(raw, r -> struct(r._1 AS c_id, r._2 AS cv)) AS cents")
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      // fallback=false: a codegen compile failure becomes a hard error,
      // not a silent interpreted fallback (the perf contract IS codegen)
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = df.selectExpr("graft_argmax_cos(v, cents) AS id",
                              s"($argmaxFoldSql) AS fold").collect()
      val expected = Seq[Any](7L, 9L, 4L, 2L, null)
      got.zip(expected).zipWithIndex.foreach { case ((r, e), i) =>
        val cg = if (r.isNullAt(0)) null else r.getLong(0)
        val fold = if (r.isNullAt(1)) null else r.getLong(1)
        assert(cg == e, s"codegen row $i: got $cg, want $e")
        assert(fold == e, s"HOF fold row $i: got $fold, want $e")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    // interpreted eval twin on the same inputs
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val centsType = ArrayType(StructType(Seq(
      StructField("c_id", LongType), StructField("cv",
        ArrayType(DoubleType)))))
    val expected = Seq[Any](7L, 9L, 4L, 2L, null)
    rows.zip(expected).foreach { case ((v, cents), e) =>
      val interp = graft.functions.GraftArgmaxCos(
        Literal.create(v, ArrayType(DoubleType)),
        Literal.create(cents.map(c => Row(c._1, c._2)), centsType))
        .eval(null)
      assert(interp == e, s"interpreted: got $interp, want $e for $cents")
    }
  }

  test("graft_idot: codegen and interpreted agree with the zip_with fold " +
       "on int-wrap and null-element inputs; length mismatch throws") {
    GraftSession.ensureExtensions(spark)
    val foldSql =
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x)"
    val df = Seq(
      (Seq[Integer](1, 2, 3), Seq[Integer](4, 5, 6)),        // plain: 32
      (Seq[Integer](1, null, 3), Seq[Integer](4, 5, 6)),      // null → NULL
      (Seq.empty[Integer], Seq.empty[Integer]))               // empty: 0
      .toDF("a", "b")
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    val got = try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      df.selectExpr("graft_idot(a, b) AS d", s"($foldSql) AS fold").collect()
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
    val expected = Seq[Any](32L, null, 0L)
    got.zip(expected).zipWithIndex.foreach { case ((r, e), i) =>
      val cg = if (r.isNullAt(0)) null else r.getLong(0)
      val fold = if (r.isNullAt(1)) null else r.getLong(1)
      assert(cg == e, s"codegen row $i: got $cg, want $e")
      assert(fold == e, s"zip_with fold row $i: got $fold, want $e")
    }
    // interpreted twin (plus the INT-WRAP row, kernel-only: under ANSI
    // mode — the session default — the fold THROWS on int overflow where
    // the kernel wraps like the pre-ANSI fold did; unreachable at the
    // call sites, whose token vectors are ±1 hash grids, so parity is
    // pinned on the reachable domain and wrap is pinned as the kernel's
    // documented out-of-domain behavior)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    def interp(a: Seq[Integer], b: Seq[Integer]): Any =
      graft.functions.GraftIntDot(
        Literal.create(a, ArrayType(IntegerType)),
        Literal.create(b, ArrayType(IntegerType))).eval(null)
    assert(interp(Seq(1, 2, 3), Seq(4, 5, 6)) == 32L)
    assert(interp(Seq(1 << 30), Seq(4)) == 0L)
    assert(interp(Seq[Integer](1, null, 3), Seq[Integer](4, 5, 6)) == null)
    assert(interp(Seq.empty, Seq.empty) == 0L)
    val wrapDf = Seq((Seq(1 << 30), Seq(4))).toDF("a", "b")
      .selectExpr("graft_idot(a, b) AS d").collect()
    assert(wrapDf.head.getLong(0) == 0L, "codegen wrap row")
    // length mismatch: the fold would null-pad; the kernel FAILS LOUDLY
    // (documented divergence — drifting dims are a build bug)
    val err = intercept[Exception] {
      Seq((Seq(1, 2), Seq(1)))
        .toDF("a", "b").selectExpr("graft_idot(a, b)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("lengths differ")), msgs(err))
  }
}
