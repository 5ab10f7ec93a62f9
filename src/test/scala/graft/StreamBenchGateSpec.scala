package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[StreamBench.gateViolations]] — the RELATIVE regression gate
  * (VERDICT r12 #6), exercised as a pure function on synthetic runs: no
  * Spark, no replay, just the arithmetic the real run applies to its
  * collapsed medians. The properties that matter:
  *
  *   1. a clean run passes;
  *   2. a uniformly slower host (every op AND the calibration op scaled
  *      by the same factor) still passes — host speed cancels, the exact
  *      defect the absolute floors of r7–r12 kept tripping on;
  *   3. a single deliberately-slowed operator trips its per-op ratio
  *      floor even when the host is otherwise fast;
  *   4. a missing floored operator is fatal;
  *   5. a broad sub-threshold slowdown that no per-op floor catches
  *      trips the calibration-scaled aggregate bound.
  */
class StreamBenchGateSpec extends AnyFunSuite {

  private val calibRows = 100000L
  private val calibSec = 4.0
  private val calibTput = calibRows / calibSec

  /** A synthetic clean run: every floored op at `headroom`× its floor
    * ratio, each taking `secPerOp` seconds (rows sized to match). */
  private def run(headroom: Double = 2.2, secPerOp: Double = 1.0,
                  hostFactor: Double = 1.0)
      : (Map[String, Double], Map[String, Long]) = {
    val med = StreamBench.relativeFloors.map { case (n, _) =>
      n -> secPerOp * hostFactor
    } + (StreamBench.CalibrationOp -> calibSec * hostFactor)
    val rows = StreamBench.relativeFloors.map { case (n, f) =>
      n -> math.max(1L,
        math.round(headroom * f * calibTput * secPerOp))
    } + (StreamBench.CalibrationOp -> calibRows)
    (med, rows)
  }

  test("a clean run passes") {
    val (med, rows) = run()
    assert(StreamBench.gateViolations(med, rows).isEmpty)
  }

  test("a uniformly 2x (and 4x) slower host passes — host speed cancels " +
       "through the same-run calibration ratio") {
    for (hf <- Seq(2.0, 4.0)) {
      val (med, rows) = run(hostFactor = hf)
      val v = StreamBench.gateViolations(med, rows)
      assert(v.isEmpty, s"hostFactor=$hf tripped: $v")
    }
  }

  test("a single deliberately 5x-slowed operator trips its own floor " +
       "and names itself") {
    val (med, rows) = run()
    val slowed = "sb_dedup"
    val v = StreamBench.gateViolations(med + (slowed -> 5.0), rows)
    assert(v.nonEmpty, "a 5x one-op slowdown must trip")
    assert(v.forall(_.startsWith(s"$slowed:")),
      s"only the slowed op may trip (headroom is 2.2x floors): $v")
  }

  test("a missing floored operator is fatal; a missing calibration op " +
       "is fatal") {
    val (med, rows) = run()
    val v = StreamBench.gateViolations(med - "sb_pack", rows - "sb_pack")
    assert(v.exists(m => m.startsWith("sb_pack:") && m.contains("MISSING")))
    val v2 = StreamBench.gateViolations(med - StreamBench.CalibrationOp,
                                        rows)
    assert(v2.exists(_.contains(StreamBench.CalibrationOp)))
  }

  test("state-bytes ceilings: at-baseline state passes, a 5x state " +
       "blow-up trips and names its op, and a run without state " +
       "reporting checks throughput only") {
    val (med, rows) = run()
    // baseline state = 1/3 of each ceiling (the ceilings carry 3x slack)
    val state = StreamBench.stateCeilings.map { case (n, c) => n -> c / 3 }
    assert(StreamBench.gateViolations(med, rows, state).isEmpty)
    // a structural keying regression: 5x the recorded state on the
    // bounded MaxSim row (the defect class the ceiling exists for)
    val blown = state + ("sb_maxsim_serve_cut" ->
      state("sb_maxsim_serve_cut") * 15)
    val v = StreamBench.gateViolations(med, rows, blown)
    assert(v.nonEmpty && v.forall(m =>
             m.startsWith("sb_maxsim_serve_cut:") && m.contains("state")),
      s"only the blown op's state ceiling may trip: $v")
    // no state map (synthetic runs): throughput-only, still green
    assert(StreamBench.gateViolations(med, rows).isEmpty)
  }

  test("a broad sub-floor slowdown trips the calibration-scaled " +
       "aggregate bound even though every per-op ratio passes") {
    // every op at a uniform cost sized to land the TOTAL 20% past the
    // calibration-scaled bound, with rows scaled to HOLD each per-op
    // ratio at 2.2x floor — only the total moves
    val bound = StreamBench.BaselineTotalSec *
      StreamBench.AggregateBoundFactor * (calibSec / StreamBench.BaselineCalibSec)
    val perOpSec = bound * 1.2 / StreamBench.relativeFloors.size
    val (med, rows) = run(secPerOp = perOpSec)
    val v = StreamBench.gateViolations(med, rows)
    assert(v.nonEmpty && v.forall(_.startsWith("TOTAL:")),
      s"only the aggregate bound may trip: $v")
  }
}
