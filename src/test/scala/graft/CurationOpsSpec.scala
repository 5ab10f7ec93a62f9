package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Semantics + plan-quality for the round-2 curation operators: as-of
  * join, binned range join, stratified sampling, tf-idf vocabulary.
  * The DuckDB oracle already hash-checks each; these tests pin the
  * *internal* invariants (the as-of pick really is the latest prior
  * click, the binned range join equals the naive inequality join, the
  * sampler is partitioning-independent) and the scale-critical plan
  * shapes (no nested-loop joins anywhere).
  */
class CurationOpsSpec extends GraftFunSuite {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("asof join picks the latest prior-or-equal click per purchase") {
    val result = run("events_asof_join").collect()
    assert(result.nonEmpty)

    // independent witness: all (user, click_ts) pairs, max'd per purchase
    val ev = graft.queries.EventQueries.eventsFor(spark, sf0001)
      .withColumn("ts_us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap

    result.foreach { r =>
      val user = r.getLong(1)
      val ts = r.getLong(2)
      val expect = clicks.getOrElse(user, Array.empty[Long])
        .takeWhile(_ <= ts).lastOption
      val got = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(got == expect, s"user=$user purchase_ts=$ts got=$got expect=$expect")
    }
    // both outcomes are exercised by the data
    assert(result.exists(_.isNullAt(4)), "no purchase without a prior click")
    assert(result.exists(!_.isNullAt(4)), "no purchase with a prior click")
  }

  test("asof join plan: single user_id window, no nested-loop join") {
    val p = GraftSqlBridge.queryExecution(run("events_asof_join"))
      .executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    // the whole as-of is ONE user_id exchange: no join, no click collapse
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange:\n$p")
  }

  test("asofJoin API: latest prior-or-equal match, nulls, tie-break") {
    import graft.implicits._
    import spark.implicits._
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 10L, 1.0, 100L), (1L, 10L, 2.0, 200L),
                     (1L, 15L, 3.0, 300L), (2L, 6L, 9.0, 400L))
      .toDF("k", "qt", "px", "qid")

    val out = trades
      .asofJoin(quotes, on = Seq("k"), leftTime = "t", rightTime = "qt",
                rightOrder = Seq("qid"))
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),   // asof_qt
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), // asof_px
        if (r.isNullAt(5)) None else Some(r.getLong(5))))  // asof_qid
      .sortBy(_._1)

    assert(out.toSeq == Seq(
      // equal-ts quote counts (>=); among the two at qt=10 the max qid wins
      ("t1", Some(10L), Some(2.0), Some(200L)),
      ("t2", Some(15L), Some(3.0), Some(300L)),
      // the only k=2 quote is AFTER the trade -> all-null payload
      ("t3", None, None, None)), out.toSeq)
  }

  test("asofJoin API: rejects column clashes and empty keys") {
    import graft.implicits._
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "asof_v")
    val r = Seq((1L, 5L, "y")).toDF("k", "qt", "v")
    intercept[IllegalArgumentException] {
      l.asofJoin(r, on = Seq("k"), leftTime = "t", rightTime = "qt")
    }
    intercept[IllegalArgumentException] {
      l.asofJoin(r, on = Nil, leftTime = "t", rightTime = "qt")
    }
  }

  test("binned range join equals the naive inequality join") {
    val binned = run("events_range_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))

    // naive witness: raw inequality join on the same session intervals
    val ev = graft.queries.EventQueries.eventsFor(spark, sf0001)
      .withColumn("ts_us", unix_micros(col("ts")))
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val runW = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = ev
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("ns", when(col("prev_us").isNull ||
        col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(runW))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("start_us"),
           (max("ts_us") + 1800000000L).as("until_us"))
    val pts = ev.select(col("user_id").as("p_user"), col("ts_us"))
    val naive = iv.crossJoin(pts)
      .filter(col("p_user") =!= col("user_id") &&
              col("ts_us") >= col("start_us") && col("ts_us") <= col("until_us"))
      .groupBy("user_id", "start_us").agg(count("*").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

    assert(binned.nonEmpty && binned.toSeq == naive.toSeq,
      s"binned=${binned.length} naive=${naive.length}")
  }

  test("range join plan avoids nested-loop/cartesian execution") {
    val p = GraftSqlBridge.queryExecution(run("events_range_join"))
      .executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"), p)
  }

  test("stratified sampler: rates honored, deterministic, partition-independent") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val keep = substring(md5(col("doc_id").cast("string")), 1, 4) <
      when(col("lang") === "en", lit("8000")).otherwise(lit("3333"))

    val kept = docs.filter(keep)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, n) =>
      val rate = if (lang == "en") 0.5 else 0.2
      val k = keptByLang.getOrElse(lang, 0L).toDouble
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(k - n * rate) < 5 * sigma + 1,
        s"lang=$lang kept=$k of $n expected=${n * rate}")
    }
    // same kept ids regardless of physical layout
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = docs.repartition(7).filter(keep)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("tfidf vocabulary: exactly top-10 per lang, scores consistent") {
    val rows = run("text_vocab_tfidf").collect()
    val perLang = rows.groupBy(_.getString(0))
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, rs) =>
      assert(rs.length == 10, s"$lang has ${rs.length} rows")
      val byRank = rs.sortBy(_.getLong(4))
      assert(byRank.map(_.getLong(4)).toSeq == (1L to 10L))
      // scores non-increasing along ranks
      val scores = byRank.map(_.getDouble(5)).toSeq
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y }, scores)
    }
  }

  test("fuzzy decontamination: planted near-dup found with the exact " +
       "jaccard, unrelated docs stay clean") {
    import spark.implicits._
    // train doc 1 = 10 tokens -> 8 distinct 3-grams; test doc 100 edits
    // the LAST token only, so they share 7 of 9 distinct grams:
    // J = 7 / 9 = 0.7778 >= 0.7
    val t10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val edited = ((1 to 9).map(i => s"w$i") :+ "zzz").mkString(" ")
    val train = Seq((1L, t10),
                    (2L, (30 to 45).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val test_ = Seq((100L, edited),
                    (101L, (60 to 75).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.operators.CorpusCuration
      .fuzzyContaminatedDocs(train, test_, threshold = 0.7, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 100L, 0.7778)), got.mkString(", "))
  }

  test("fuzzy decontamination matches brute-force cross-side jaccard on " +
       "the catalog's route split") {
    val route = substring(md5(col("doc_id").cast("string")), 1, 4)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("route", route)
    val train = docs.filter(col("route") < "cccc")
    val test_ = docs.filter(col("route") >= "cccc")
    def shingles(d: org.apache.spark.sql.DataFrame, as: String) = d
      .select(col("doc_id").as(as),
              expr("split(trim(text), '\\\\s+')").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col(as),
              expr("""array_distinct(transform(sequence(0, size(tk) - 3),
                     i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])))""")
                .as(s"s_$as"))
    val brute = shingles(train, "train_id")
      .join(shingles(test_, "test_id"))
      .withColumn("inter",
                  size(array_intersect(col("s_train_id"), col("s_test_id"))))
      .withColumn("j", col("inter") /
        (size(col("s_train_id")) + size(col("s_test_id")) - col("inter")))
      .filter(col("j") >= 0.7)
      .select(col("train_id"), col("test_id"), round(col("j"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = graft.operators.CorpusCuration
      .fuzzyContaminatedDocs(train, test_, threshold = 0.7, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "route split should straddle planted near-dups")
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("fuzzy decontamination: argument validation") {
    import spark.implicits._
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.operators.CorpusCuration.fuzzyContaminatedDocs(
        d, d, threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.CorpusCuration.fuzzyContaminatedDocs(
        d, d, threshold = 0.7, numHashes = 7)
    }
  }

  test("minhash banding is analytic, enforced, and exercised at a " +
       "NON-default threshold: the stated bound holds, unsound " +
       "geometries are refused, and τ=0.9 decontamination (r=4 tier) " +
       "matches brute force") {
    import graft.operators.GraftDedup
    // the stated bound at the certified operating points
    assert(GraftDedup.minhashBanding(0.7, 128) == ((2, 64)))
    assert(GraftDedup.minhashBanding(0.9, 128) == ((4, 32)))
    assert(GraftDedup.bandMissProb(0.7, 2, 64) < 1e-18)
    assert(GraftDedup.bandMissProb(0.9, 4, 32) < 1e-14)
    // monotone in J: the bound is worst-case over the accepted region
    assert(GraftDedup.bandMissProb(0.95, 4, 32) <
           GraftDedup.bandMissProb(0.9, 4, 32))
    // REFUSED geometries — the silent-recall-loss cases the old
    // hard-coded rule accepted: a low threshold at r=2 (0.2% miss), and
    // an explicit r too aggressive for its threshold
    val eLow = intercept[IllegalArgumentException] {
      GraftDedup.minhashBanding(0.3, 128)
    }
    assert(eLow.getMessage.contains("missTarget"), eLow.getMessage)
    intercept[IllegalArgumentException] {
      GraftDedup.minhashBanding(0.75, 128, rowsPerBand = 8)
    }
    // ...and the refusal reaches the operators
    import spark.implicits._
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.operators.CorpusCuration.fuzzyContaminatedDocs(
        d, d, threshold = 0.3)
    }
    // a relaxed EXPLICIT target runs (documented intentional recall loss)
    graft.operators.CorpusCuration.fuzzyContaminatedDocs(
      d, d, threshold = 0.3, missTarget = 0.01)
    // non-default τ=0.9 engages the r=4 tier end-to-end; brute parity
    val route = substring(md5(col("doc_id").cast("string")), 1, 4)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("route", route)
    val train = docs.filter(col("route") < "cccc")
    val test_ = docs.filter(col("route") >= "cccc")
    def shingles(df: org.apache.spark.sql.DataFrame, as: String) = df
      .select(col("doc_id").as(as),
              expr("split(trim(text), '\\\\s+')").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col(as),
              expr("""array_distinct(transform(sequence(0, size(tk) - 3),
                     i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2])))""")
                .as(s"s_$as"))
    val brute = shingles(train, "train_id")
      .join(shingles(test_, "test_id"))
      .withColumn("inter",
                  size(array_intersect(col("s_train_id"), col("s_test_id"))))
      .withColumn("j", col("inter") /
        (size(col("s_train_id")) + size(col("s_test_id")) - col("inter")))
      .filter(col("j") >= 0.9)
      .select(col("train_id"), col("test_id"), round(col("j"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = graft.operators.CorpusCuration
      .fuzzyContaminatedDocs(train, test_, threshold = 0.9, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedupSubstringSpans keeps the canonical occurrence, cuts every copy") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val span2 = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"delta $span epsilon zeta"),
      (3L, "unique tokens only here nothing repeated at all"),
      (4L, s"$span filler1 filler2 $span"),
      (5L, s"$span2 mid1 mid2 $span2")).toDF("doc_id", "text")
    val out = graft.operators.CorpusCuration.dedupSubstringSpans(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 holds the canonical (smallest (id, pos)) occurrence — intact
    assert(out(1L) == ((11L, 0L, md5hex(s"alpha beta $span gamma"))))
    // doc 2's copy is cut; the novel text around it survives
    assert(out(2L) == ((11L, 8L, md5hex("delta epsilon zeta"))))
    // untouched document
    assert(out(3L) == ((8L, 0L,
      md5hex("unique tokens only here nothing repeated at all"))))
    // both of doc 4's occurrences are non-canonical (doc 1 wins) — both cut
    assert(out(4L) == ((18L, 16L, md5hex("filler1 filler2"))))
    // intra-document repeat: the FIRST occurrence is canonical and survives
    assert(out(5L) == ((18L, 8L, md5hex(s"$span2 mid1 mid2"))))
    // contrast: scrubRepeatedSpans removes every occurrence, including the
    // canonical one — keep-first is the dedup, scrub is boilerplate removal
    val scrubbed = graft.operators.CorpusCuration.scrubRepeatedSpans(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scrubbed(1L) == 8L && scrubbed(5L) == 16L)
  }

  test("gopherRepetitionStats: exact fractions and thresholds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb aa bb aa bb"),                       // top-2-gram saturated
      (2L, (0 to 9).map(i => s"a$i").mkString(" ")),   // all-unique, boundary
      (3L, "p1 p2 p3 p4 p5 x p1 p2 p3 p4 p5"),         // duplicated 5-gram
      (4L, "a b c")).toDF("doc_id", "text")            // < 5 tokens → excluded
    val out = graft.operators.CorpusCuration.gopherRepetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!out.contains(4L))
    // doc 1: "aa bb" x3, gram chars 4, total chars 12 → 1.0; no dup 5-gram
    assert(out(1L) == ((6L, 1.0, 0.0, false)))
    // doc 2: every 2-gram unique → smallest "a0 a1" c=1; 4/20 = 0.2 (kept,
    // boundary inclusive); no dup 5-grams
    assert(out(2L) == ((10L, 0.2, 0.0, true)))
    // doc 3: "p1 p2 p3 p4 p5" occurs at pos 0 and 6 → 10 of 11 tokens
    // covered → 20 of 21 token chars ("x" is 1); top 2-gram "p1 p2" c=2 → 8/21
    assert(out(3L) == ((11L, math.rint(8.0 / 21 * 1e4) / 1e4,
                        math.rint(20.0 / 21 * 1e4) / 1e4, false)))
  }

  test("dsirScores ranks target-like documents above raw-only documents") {
    import spark.implicits._
    val tgtText = (0 to 19).map(i => s"tg${i % 4}").mkString(" ")
    val rawText = (0 to 19).map(i => s"rw${i % 4}").mkString(" ")
    val docs = (
      (0 until 6).map(i => (i.toLong, tgtText, i < 4)) ++      // 4 target + 2 raw dups of target-style text
      (6 until 10).map(i => (i.toLong, rawText, false))).toSeq  // raw-only style
      .toDF("doc_id", "text", "tgt")
    val out = graft.operators.CorpusCuration.dsirScores(
        docs, isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every doc has 19 gram occurrences
    assert(out.values.forall(_._1 == 19L))
    // docs written in the target's bigram distribution outscore raw-only
    val tgtStyleScore = out(4L)._2 // raw doc, target-style text
    val rawStyleScore = out(7L)._2
    assert(tgtStyleScore > rawStyleScore,
           s"target-style $tgtStyleScore vs raw-only $rawStyleScore")
    // identical text → identical score (scores depend only on content)
    assert(out(0L)._2 == tgtStyleScore)
    // deterministic across executions
    val again = graft.operators.CorpusCuration.dsirScores(
        docs, isTarget = col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }

  test("snapshotDiff: statuses exact on a hand-built pair of snapshots, " +
       "null text compares as a value") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("same")), (2L, Some("old")), (3L, Some("gone")),
      (4L, None: Option[String]), (5L, None: Option[String])).toDF("doc_id", "text")
    val after = Seq(
      (1L, Some("same")), (2L, Some("new")), (6L, Some("born")),
      (4L, None: Option[String]), (5L, Some("filled"))).toDF("doc_id", "text")
    val out = graft.operators.CorpusCuration.snapshotDiff(before, after)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
                      4L -> "unchanged", 5L -> "changed", 6L -> "added"),
      out.toString)
  }

  test("snapshotDiff: identical snapshots are all unchanged; the work " +
       "list is empty") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = graft.operators.CorpusCuration.snapshotDiff(docs, docs)
    assert(out.filter(col("status") =!= "unchanged").count() == 0)
    assert(out.count() == docs.count())
  }

  test("winnowFingerprints: the winnowing guarantee — any shared run of " +
       "w+k-1 tokens yields a shared fingerprint; density ~ 2/(w+1); " +
       "sub-window docs collapse to one fingerprint") {
    import spark.implicits._
    import graft.operators.GraftText
    val rnd = new scala.util.Random(42)
    def words(n: Int, pfx: String) =
      (0 until n).map(_ => pfx + rnd.nextInt(100000)).mkString(" ")
    // 40 pairs: disjoint-vocab bodies with ONE shared 6-token run
    // (k=3, w=4 → guarantee threshold w+k-1 = 6) spliced at random spots
    val pairs = (0 until 40).map { i =>
      val shared = words(6, s"sh${i}_")
      val a = words(rnd.nextInt(20) + 8, s"a${i}_") + " " + shared + " " +
              words(rnd.nextInt(20) + 8, s"a${i}x_")
      val b = words(rnd.nextInt(20) + 8, s"b${i}_") + " " + shared + " " +
              words(rnd.nextInt(20) + 8, s"b${i}x_")
      (i.toLong, a, b)
    }
    val docs = pairs.flatMap { case (i, a, b) =>
      Seq((i * 2, i, a), (i * 2 + 1, i, b)) }
      .toDF("doc_id", "pair", "text")
    val fps = docs
      .select(col("doc_id"), col("pair"),
        GraftText.winnowFingerprints(
          GraftText.whitespaceTokens(col("text"))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toSet))
    pairs.foreach { case (i, _, _) =>
      val two = fps.filter(_._2 == i).map(_._3)
      assert(two.length == 2 && two(0).intersect(two(1)).nonEmpty,
        s"pair $i: shared 6-token run MUST share a fingerprint " +
        "(the winnowing guarantee)")
    }
    // density on the real corpus: distinct selections over grams stay in
    // the winnowing band (theory 2/(w+1) = 0.4 before dedup)
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(GraftText.whitespaceTokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 20)
      .select((size(col("tk")) - 2).as("g"),
              size(GraftText.winnowFingerprints(col("tk"))).as("f"))
      .agg(sum("f").cast("double").as("fs"), sum("g").cast("double").as("gs"))
      .collect()(0)
    val density = corpus.getDouble(0) / corpus.getDouble(1)
    assert(density > 0.2 && density < 0.55, s"density $density out of band")
    // 3 tokens = 1 gram (< w) → exactly one fingerprint; 2 tokens → NULL
    val tiny = Seq((1L, "alpha beta gamma"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), GraftText.winnowFingerprints(
        GraftText.whitespaceTokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tiny(1L).exists(_.asInstanceOf[scala.collection.Seq[_]].size == 1))
    assert(tiny(2L).isEmpty, "docs below k tokens must yield NULL")
  }
}
