package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over a distributed embedding corpus, split the way 100 TB demands:
  * the CORPUS-SIZED work is [[GraftSimilarity.gramMatrix]] (one pass, one
  * O(d²)-long exchange, exact Int64); everything here is either d×d driver
  * math or a stateless per-row projection.
  *
  *  - [[components]] — eigensolve of the exact covariance recovered from
  *    the gram rows. d(d+1)/2 rows collect to the driver BY DESIGN: the
  *    covariance is d² doubles (d = embedding dim, ≤ a few thousand), and
  *    a cyclic Jacobi sweep on it is microseconds — this is the one place
  *    in PCA where driver-side work is the correct distribution of labor.
  *  - [[project]] — the components fold into constant array literals and
  *    the projection is ONE stateless codegen-friendly expression
  *    (`aggregate` over `zip_with`): no join, no state, no shuffle — it
  *    runs unchanged on a streaming frame (the DSIR train/apply shape).
  *
  * Determinism: the covariance is exact (integer gram), and the Jacobi
  * sweep order is fixed (row-cyclic, pivot by fixed p<q order), so
  * components are bit-identical run to run. Eigenvector SIGN is fixed by
  * making each vector's largest-|component| coordinate positive.
  */
object GraftPca {

  /** Principal components of the covariance encoded by `gram` rows
    * (`(i, j, sxy, sx, sy, n)` from [[GraftSimilarity.gramMatrix]] at
    * quantization `grid`). Returns (eigenvalues desc, eigenvectors row per
    * component, mean vector) in ORIGINAL data units.
    */
  def components(gram: DataFrame, grid: Long, k: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    require(k >= 1, s"GraftPca.components: k must be >= 1, got $k")
    val rows = gram.select("i", "j", "sxy", "sx", "sy", "n").collect()
    require(rows.nonEmpty, "GraftPca.components: empty gram frame")
    val d = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(rows.length == d.toLong * (d + 1) / 2,
      s"GraftPca.components: expected full upper triangle of d=$d " +
      s"(${d * (d + 1) / 2} rows), got ${rows.length}")
    val nL = rows(0).getLong(5)
    val n = nL.toDouble
    val g2 = grid.toDouble * grid.toDouble
    val cov = Array.ofDim[Double](d, d)
    val mean = new Array[Double](d)
    rows.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      // centered covariance from exact sums: (n·Σxy − Σx·Σy) / n² — the
      // numerator EXACT in BigInt (the products n·Σxy and Σx·Σy exceed
      // the 2^53 double-exact range at modest n — ADVICE r10); rounding
      // happens only in the final to-double conversion and division,
      // both correctly rounded and run-order-free
      val num = BigInt(nL) * r.getLong(2) - BigInt(r.getLong(3)) * r.getLong(4)
      val c = num.toDouble / (n * n * g2)
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mean(i) = r.getLong(3) / (n * grid)
    }
    val (values, vectors) = jacobiEigen(cov)
    val kk = math.min(k, d)
    (values.take(kk), vectors.take(kk), mean)
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: rotate away the
    * largest off-diagonal entries in fixed row-cyclic sweeps until the
    * off-diagonal mass is < 1e-12 of the diagonal. Returns (eigenvalues
    * desc, matching unit eigenvectors as rows, sign-fixed). O(d³) per
    * sweep, ~6–10 sweeps — driver-trivial for d ≤ a few thousand.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    val scale = math.max(1e-300, (0 until d).map(i => a(i)(i).abs).sum)
    var sweep = 0
    while (off() > 1e-24 * scale * scale && sweep < 64) {
      for (p <- 0 until d; q <- p + 1 until d if a(p)(q) != 0.0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // t = sign(θ)/(|θ| + √(θ²+1)); θ = 0 (equal diagonal) takes the
        // full 45° rotation rather than signum's no-op 0
        val raw = math.signum(theta) /
          (theta.abs + math.sqrt(theta * theta + 1.0))
        val t = if (raw == 0.0) 1.0 else raw
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { j =>
      val w = Array.tabulate(d)(i => v(i)(j))
      // sign convention: the largest-|coordinate| entry is positive —
      // removes the eigensolver's inherent sign freedom
      val m = w.indices.maxBy(i => (w(i).abs, -i))
      if (w(m) < 0) w.map(x => -x) else w
    }.toArray
    (values, vectors)
  }

  /** Past this many k×d component doubles, [[project]] stops folding them
    * into plan literals and attaches them by broadcast join instead: at
    * testdata dims (d = 64) literals are elegant and stream-trivial, but
    * at production dims (d = 4096, k = 256 → ~1M doubles) a megabyte-
    * scale plan tree bloats every plan copy, codegen source, and event-
    * log entry (VERDICT r10 #4). 64k doubles ≈ 512 KB of plan — the same
    * order as [[graft.operators.ScaleHints]]' broadcast gating. */
  val ProjectLiteralMaxDoubles: Int = 1 << 16

  /** Project `vecCol` onto `comps` (rows from [[components]]), centering
    * with `mean`: appends `pc: array<double>` with
    * `pc[c] = (v − mean)·w_c = v·w_c − mean·w_c`.
    *
    * Below `maxLiteralDoubles` total component doubles, the components
    * and per-component mean offsets fold into CONSTANT array literals —
    * one stateless projection, broadcast-free, shuffle-free, legal on a
    * streaming DataFrame as-is. Past the gate they ride a ONE-ROW
    * broadcast side relation instead (a stream-static cross join — still
    * streaming-legal, and the row ships through the broadcast machinery
    * rather than the plan tree). Both paths evaluate the identical
    * left-to-right `aggregate(zip_with(...))` fold per component, so
    * projections are bit-identical across the gate (PcaSpec pins it).
    */
  def project(vecs: DataFrame, comps: Array[Array[Double]],
              mean: Array[Double], vecCol: String = "v",
              maxLiteralDoubles: Int = ProjectLiteralMaxDoubles)
      : DataFrame = {
    require(comps.nonEmpty, "GraftPca.project: no components")
    require(comps.forall(_.length == mean.length),
      "GraftPca.project: component/mean dimension mismatch")
    val offs = comps.map(w =>
      w.zip(mean).map { case (wi, mi) => wi * mi }.sum)
    if (comps.length.toLong * mean.length <= maxLiteralDoubles) {
      val exprs = comps.zip(offs).map { case (w, off) =>
        val lit = w.mkString("array(", "D, ", "D)")
        s"""aggregate(zip_with($vecCol, $lit, (x, y) -> x * y),
           |          0.0D, (acc, z) -> acc + z) - ${off}D""".stripMargin
      }
      vecs.withColumn("pc", expr(exprs.mkString("array(", ", ", ")")))
    } else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val spark = vecs.sparkSession
      val schema = StructType(Seq(
        StructField("__pcomps",
          ArrayType(ArrayType(DoubleType, containsNull = false),
                    containsNull = false), nullable = false),
        StructField("__poffs",
          ArrayType(DoubleType, containsNull = false), nullable = false)))
      val side = spark.createDataFrame(
        java.util.Arrays.asList(
          Row(comps.map(_.toSeq).toSeq, offs.toSeq)), schema)
      // __pcomps/__poffs are plain attributes here, so the HOF lambdas
      // bind them once per row — not the computed-array rebinding cliff
      vecs.crossJoin(broadcast(side))
        .withColumn("pc", expr(
          s"""zip_with(__pcomps, __poffs, (w, o) ->
             |  aggregate(zip_with($vecCol, w, (x, y) -> x * y),
             |            0.0D, (acc, z) -> acc + z) - o)""".stripMargin))
        .drop("__pcomps", "__poffs")
    }
  }
}
