package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType, IntegerType, LongType, StringType}

/** SQL-reach registration for the graft expression library — the analog of
  * the reference registering its extension on every session
  * (`/root/reference/tests/e2e.rs:95-100`), at expression granularity:
  * `SELECT graft_minhash(shingles, 128)` works after
  * `withExtensions(new GraftExtensions)` or `ensureExtensions`.
  */
object GraftFunctionRegistry {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> {
      case Seq(c) => GraftMinHash(c, 128)
      case Seq(c, Literal(k: Int, IntegerType)) => GraftMinHash(c, k)
      case other => throw new IllegalArgumentException(
        s"graft_minhash(array<string>[, k literal]) — got ${other.size} args")
    },
    "graft_simhash" -> {
      case Seq(c) => GraftSimHash(c)
      case other => throw new IllegalArgumentException(
        s"graft_simhash(array<string>) — got ${other.size} args")
    },
    "graft_sig_agree" -> {
      case Seq(a, b) => GraftSigAgree(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_sig_agree(array<long>, array<long>) — got ${other.size} args")
    },
    "graft_jaccard_sorted" -> {
      case Seq(a, b) => GraftJaccardSorted(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_jaccard_sorted(array<long>, array<long>) — got ${other.size} args")
    },
    "graft_cosine" -> {
      case Seq(a, b) => GraftCosine(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_cosine(array<double>, array<double>) — got ${other.size} args")
    },
    "graft_argmax_cos" -> {
      case Seq(v, cents) => GraftArgmaxCos(v, cents)
      case other => throw new IllegalArgumentException(
        s"graft_argmax_cos(array<double>, array<struct<long, " +
        s"array<double>>>) — got ${other.size} args")
    },
    "graft_idot" -> {
      case Seq(a, b) => GraftIntDot(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_idot(array<int>, array<int>) — got ${other.size} args")
    },
    "graft_srp_sig" -> {
      case Seq(v, nb) => GraftSrpSig(v, nb, Literal(42L, LongType))
      case Seq(v, nb, seed) => GraftSrpSig(v, nb, seed)
      case other => throw new IllegalArgumentException(
        s"graft_srp_sig(array<double>, nbits[, seed]) — got ${other.size} args")
    },
    "graft_minhash_agg" -> {
      case Seq(c) => GraftMinHashAgg(c, 128).toAggregateExpression()
      case Seq(c, Literal(k: Int, IntegerType)) =>
        GraftMinHashAgg(c, k).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"graft_minhash_agg(string[, k literal]) — got ${other.size} args")
    },
    "graft_cdc_chunks" -> {
      case Seq(c, Literal(minLen: Int, IntegerType), Literal(mask: Int, IntegerType)) =>
        GraftCdcChunks(c, minLen, mask.toLong)
      case Seq(c, Literal(minLen: Int, IntegerType), Literal(mask: Long, LongType)) =>
        GraftCdcChunks(c, minLen, mask)
      case other => throw new IllegalArgumentException(
        s"graft_cdc_chunks(text, minLen literal, mask literal) — got ${other.size} args")
    },
    "graft_topk" -> {
      case Seq(s, i, Literal(k: Int, IntegerType)) =>
        GraftTopKAgg(s, i, k).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"graft_topk(score double, id bigint, k literal) — got ${other.size} args")
    },
    "graft_theta_sketch" -> {
      case Seq(c) => GraftThetaAgg(c, 12).toAggregateExpression()
      case Seq(c, Literal(lgK: Int, IntegerType)) =>
        GraftThetaAgg(c, lgK).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"graft_theta_sketch(string[, lgK literal]) — got ${other.size} args")
    },
    "graft_theta_est" -> {
      case Seq(c) => GraftThetaEst(c)
      case other => throw new IllegalArgumentException(
        s"graft_theta_est(binary) — got ${other.size} args")
    },
    "graft_theta_intersect_est" -> {
      case Seq(a, b) => GraftThetaIntersectEst(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_theta_intersect_est(binary, binary) — got ${other.size} args")
    },
    "graft_theta_is_exact" -> {
      case Seq(c) => GraftThetaIsExact(c)
      case other => throw new IllegalArgumentException(
        s"graft_theta_is_exact(binary) — got ${other.size} args")
    },
    "graft_vec_sum" -> {
      case Seq(c) => GraftVecSumAgg(c).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"graft_vec_sum(array<double|float>) — got ${other.size} args")
    },
    "graft_vec_sum_long" -> {
      case Seq(c) => GraftVecSumLongAgg(c).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"graft_vec_sum_long(array<long|int>) — got ${other.size} args")
    },
    "graft_q8" -> {
      case Seq(c) => GraftQ8(c)
      case other => throw new IllegalArgumentException(
        s"graft_q8(array<double>) — got ${other.size} args")
    },
    "graft_q8_cos" -> {
      case Seq(a, b) => GraftQ8Cos(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_q8_cos(array<int>, array<int>) — got ${other.size} args")
    },
    "graft_q8b" -> {
      case Seq(c) => GraftQ8Bytes(c)
      case other => throw new IllegalArgumentException(
        s"graft_q8b(array<double>) — got ${other.size} args")
    },
    "graft_q8b_cos" -> {
      case Seq(a, b) => GraftQ8BytesCos(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_q8b_cos(binary, binary) — got ${other.size} args")
    },
    "graft_q4b" -> {
      case Seq(c) => GraftQ4Bytes(c)
      case other => throw new IllegalArgumentException(
        s"graft_q4b(array<double>) — got ${other.size} args")
    },
    "graft_q4b_cos" -> {
      case Seq(a, b) => GraftQ4BytesCos(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_q4b_cos(binary, binary) — got ${other.size} args")
    },
    "graft_b1b" -> {
      case Seq(c) => GraftB1Bytes(c)
      case other => throw new IllegalArgumentException(
        s"graft_b1b(array<double>) — got ${other.size} args")
    },
    "graft_b1_cos" -> {
      case Seq(a, b) => GraftB1Cos(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_b1_cos(binary, binary) — got ${other.size} args")
    },
    "graft_jaro_winkler" -> {
      case Seq(a, b) => GraftJaroWinkler(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_jaro_winkler(string, string) — got ${other.size} args")
    },
    "graft_mmr" -> {
      // lambda accepts any NUMERIC literal: Spark SQL parses a plain
      // fractional literal like 0.5 as DecimalType, so matching only
      // Literal(Double) rejected the natural SQL call `graft_mmr(a, 5,
      // 0.5)` — and the arity-shaped fallthrough misreported the problem
      // as "got 3 args" (ADVICE r13). Wrong literal TYPES now get their
      // own message distinct from wrong arity.
      case Seq(c, kE, lE) =>
        val k = kE match {
          case Literal(k: Int, IntegerType) => k
          case other => throw new IllegalArgumentException(
            s"graft_mmr: k must be an integer literal, got $other")
        }
        val l = lE match {
          case Literal(l: Double, DoubleType) => l
          case Literal(d: Decimal, _: DecimalType) => d.toDouble
          case Literal(i: Int, IntegerType) => i.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_mmr: lambda must be a numeric literal in [0, 1], " +
            s"got $other")
        }
        GraftMmr(c, k, l)
      case other => throw new IllegalArgumentException(
        "graft_mmr(array<struct<id, rel, v>>, k literal, lambda literal) — " +
        s"got ${other.size} args")
    },
    "graft_freq_sketch" -> {
      case Seq(c) => GraftFreqAgg(c, 1024).toAggregateExpression()
      case Seq(c, Literal(m: Int, IntegerType)) =>
        GraftFreqAgg(c, m).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"graft_freq_sketch(string[, maxMapSize literal]) — got ${other.size} args")
    },
    "graft_freq_items" -> {
      case Seq(c) => GraftFreqItems(c)
      case other => throw new IllegalArgumentException(
        s"graft_freq_items(binary) — got ${other.size} args")
    },
    "graft_freq_is_exact" -> {
      case Seq(c) => GraftFreqIsExact(c)
      case other => throw new IllegalArgumentException(
        s"graft_freq_is_exact(binary) — got ${other.size} args")
    },
    "graft_pq_pack" -> {
      case Seq(c) => GraftPqPack(c)
      case other => throw new IllegalArgumentException(
        s"graft_pq_pack(array<int>) — got ${other.size} args")
    },
    "graft_pq_nearest" -> {
      case Seq(a, b) => GraftPqNearest(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_pq_nearest(array<double>, array<double>) — got ${other.size} args")
    },
    "graft_pq_adc" -> {
      case Seq(a, b) => GraftPqAdc(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_pq_adc(array<int>|binary, array<double>) — got ${other.size} args")
    },
    "graft_normalize" -> {
      case Seq(c) => GraftNormalize(c, "NFC")
      case Seq(c, Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
        GraftNormalize(c, f.toString)
      case other if other.size == 2 => throw new IllegalArgumentException(
        "graft_normalize(string, form) — form must be a string literal " +
          s"(NFC/NFD/NFKC/NFKD), got non-literal ${other(1).sql}")
      case other => throw new IllegalArgumentException(
        s"graft_normalize(string[, form literal]) — got ${other.size} args")
    },
  )

  // ---- typed Column API (no SQL registration needed) -----------------
  def minhash(c: Column, k: Int = 128): Column =
    GraftSqlBridge.columnOf(GraftMinHash(GraftSqlBridge.expressionOf(c), k))

  def simhash(c: Column): Column =
    GraftSqlBridge.columnOf(GraftSimHash(GraftSqlBridge.expressionOf(c)))

  def normalize(c: Column, form: String = "NFC"): Column =
    GraftSqlBridge.columnOf(GraftNormalize(GraftSqlBridge.expressionOf(c), form))

  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.columnOf(GraftCosine(
      GraftSqlBridge.expressionOf(a), GraftSqlBridge.expressionOf(b)))

  def pqNearest(sv: Column, flatCodebook: Column): Column =
    GraftSqlBridge.columnOf(GraftPqNearest(
      GraftSqlBridge.expressionOf(sv),
      GraftSqlBridge.expressionOf(flatCodebook)))

  def pqPack(codes: Column): Column =
    GraftSqlBridge.columnOf(GraftPqPack(GraftSqlBridge.expressionOf(codes)))
}
