package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout helpers for multi-dimensional clustering — the Z-order
  * (Morton) curve that makes parquet row-group min/max stats selective on
  * MORE THAN ONE column at once. Sorting a table by a single key clusters
  * that key only; sorting by the interleaved z-value clusters every
  * participating dimension "pretty well", so a 2-d box predicate skips
  * most row groups at scan time — the standard layout trade for 100 TB
  * fact tables queried along several axes.
  *
  * The z-value is pure integer bit arithmetic (shift/and/or), identical
  * in any engine — no UDF, no float, fully codegen'd.
  */
object GraftLayout {

  /** Morton z-value interleaving the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. `bits` ≤ 31 keeps the result in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_.bitwiseOR(_))
  }
}
