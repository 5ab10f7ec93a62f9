package graft.connect

import java.io.ByteArrayOutputStream

/** Hand-rolled protobuf wire codec for the reference's extension messages
  * (`/root/reference/proto/extension.proto:24-36`):
  *
  * {{{
  * message LMessage { oneof Extension { LSample sample = 1; } }
  * message LSample  { float fraction = 1; optional int64 seed = 2; }
  * }}}
  *
  * plus one addition the Spark Connect transport requires:
  * `bytes child = 3` inside `LSample`, carrying the serialized
  * `spark.connect.Relation` of the input. DataFusion's extension codec
  * receives operator inputs out-of-band (`/root/reference/src/codec/
  * extension.rs:39-80` gets `inputs: &[LogicalPlan]`), while a Spark
  * Connect relation message is self-contained — the child travels inside
  * the extension message instead.
  *
  * The server-side plugin receives the serialized `google.protobuf.Any`
  * (`type_url` field 1, `value` field 2) that the client packed, so the
  * codec also reads/writes the Any envelope. Hand-rolling ~80 lines of
  * wire format keeps the library free of any protobuf runtime dependency;
  * the format is the public protobuf encoding (varint + length-delimited
  * + fixed32, developers.google.com/protocol-buffers/docs/encoding).
  */
object SampleProto {

  val TypeUrl = "type.googleapis.com/extension.ballista.LMessage"

  final case class LSample(fraction: Float, seed: Option[Long],
                           child: Array[Byte])

  // ---- writer ----------------------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeBytesField(out: ByteArrayOutputStream, field: Int,
                              b: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, b.length.toLong)
    out.write(b)
  }

  def encodeLSample(s: LSample): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (s.fraction != 0.0f) { // proto3 default elision
      writeVarint(out, (1 << 3) | 5) // field 1, fixed32
      val bits = java.lang.Float.floatToIntBits(s.fraction)
      out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
      out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
    }
    s.seed.foreach { v => // `optional` ⇒ presence is explicit, 0 included
      writeVarint(out, (2 << 3) | 0)
      writeVarint(out, v)
    }
    if (s.child.nonEmpty) writeBytesField(out, 3, s.child)
    out.toByteArray
  }

  /** LMessage{ sample = ... } envelope. */
  def encodeLMessage(s: LSample): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeBytesField(out, 1, encodeLSample(s))
    out.toByteArray
  }

  /** The full client payload: `google.protobuf.Any` wrapping LMessage. */
  def encodeAny(s: LSample): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeBytesField(out, 1, TypeUrl.getBytes("UTF-8"))
    writeBytesField(out, 2, encodeLMessage(s))
    out.toByteArray
  }

  // ---- reader ----------------------------------------------------------

  private final class Reader(buf: Array[Byte], from: Int, until: Int) {
    var pos: Int = from
    def hasMore: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        require(shift < 64, "malformed varint")
      }
      acc
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def lenDelim(): (Int, Int) = {
      val n = varint().toInt
      val r = (pos, pos + n); pos += n; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelim()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  /** Decode the serialized Any the Connect server hands the plugin.
    * Returns None when the type_url is not ours (another extension's
    * relation — the registry probes every plugin in turn).
    */
  def decodeAny(raw: Array[Byte]): Option[LSample] = {
    val r = new Reader(raw, 0, raw.length)
    var url: String = ""
    var value: Option[(Int, Int)] = None
    while (r.hasMore) {
      val tag = r.varint()
      (tag >> 3).toInt match {
        case 1 =>
          val (a, b) = r.lenDelim()
          url = new String(raw, a, b - a, "UTF-8")
        case 2 => value = Some(r.lenDelim())
        case _ => r.skip((tag & 7).toInt)
      }
    }
    if (url != TypeUrl) None
    else value.map { case (a, b) => decodeLMessage(raw, a, b) }
  }

  private def decodeLMessage(buf: Array[Byte], from: Int, until: Int): LSample = {
    val r = new Reader(buf, from, until)
    var res: Option[LSample] = None
    while (r.hasMore) {
      val tag = r.varint()
      (tag >> 3).toInt match {
        case 1 =>
          val (a, b) = r.lenDelim()
          res = Some(decodeLSample(buf, a, b))
        case _ => r.skip((tag & 7).toInt)
      }
    }
    res.getOrElse(throw new IllegalArgumentException(
      "LMessage carries no extension variant"))
  }

  private def decodeLSample(buf: Array[Byte], from: Int, until: Int): LSample = {
    val r = new Reader(buf, from, until)
    var fraction = 0.0f
    var seed: Option[Long] = None
    var child: Array[Byte] = Array.emptyByteArray
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 5) => fraction = java.lang.Float.intBitsToFloat(r.fixed32())
        case (2, 0) => seed = Some(r.varint())
        case (3, 2) =>
          val (a, b) = r.lenDelim()
          child = java.util.Arrays.copyOfRange(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    LSample(fraction, seed, child)
  }
}
