package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear-hash rolling chunker, the FastCDC
  * family's base construction — public literature): the byte stream is cut
  * where a rolling hash of the recent bytes hits a mask condition, so chunk
  * BOUNDARIES move with the content. An insertion or deletion only
  * re-chunks its neighborhood — every later chunk re-aligns — which is why
  * storage dedup uses CDC where fixed-width blocks would misalign the
  * entire suffix.
  */
object GraftCdc {

  /** Gear table: 256 fixed pseudo-random longs from splitmix64 (public
    * domain, Steele et al.) of the byte value — deterministic everywhere.
    */
  val Gear: Array[Long] = Array.tabulate(256) { b =>
    var z = b.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Chunk hashes (xxhash64 of each chunk's bytes) of the UTF-8 byte stream
    * of `s`. A boundary is cut after byte i when the Gear rolling hash has
    * its `mask` bits all zero AND the current chunk has at least `minLen`
    * bytes (avg chunk ≈ minLen + 2^maskBits). Called from both interpreted
    * eval and generated code — a single static call keeps the expression
    * inside whole-stage codegen.
    */
  def chunkHashes(s: UTF8String, minLen: Int, mask: Long): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[java.lang.Long]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      if (i - start + 1 >= minLen && (h & mask) == 0L) {
        out.add(XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start + 1,
          GraftHashing.Seed1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) {
      out.add(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, n - start,
        GraftHashing.Seed1))
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `graft_cdc_chunks(text, minLen, mask)` → `array<long>`: content-defined
  * chunk hashes of a string — the dedup key for long documents where
  * near-dups differ by local edits. Empty string → empty array.
  */
case class GraftCdcChunks(child: Expression, minLen: Int, mask: Long)
    extends UnaryExpression {

  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(mask > 0, s"mask must be positive, got $mask")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    GraftCdc.chunkHashes(input.asInstanceOf[UTF8String], minLen, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftCdc.chunkHashes($c, $minLen, ${mask}L);")

  override protected def withNewChildInternal(newChild: Expression): GraftCdcChunks =
    copy(child = newChild)
}
