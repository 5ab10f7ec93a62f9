package graft

import org.apache.spark.sql.functions._
import graft.queries.MultimodalQueries.FakeMedia

/** Multimodal plumbing: binary payload schema, stubbed decoder determinism,
  * and agreement between the typed-Dataset decode path and direct
  * computation.
  */
class MultimodalSpec extends GraftFunSuite {

  test("decode stub is deterministic and byte-derived") {
    val b = "hello world".getBytes("UTF-8")
    val d1 = FakeMedia.decode(b)
    val d2 = FakeMedia.decode(b)
    assert(d1 == d2)
    assert(d1.width == 64 + b.length % 64)
    assert(d1.minByte >= 0 && d1.maxByte <= 255 && d1.meanByte > 0)
    val empty = FakeMedia.decode(Array.emptyByteArray)
    assert(empty.meanByte == 0.0 && empty.minByte == 0 && empty.maxByte == 0)
  }

  test("mm_decode_features agrees with driver-side recomputation") {
    val got = SparkEntry.queries("mm_decode_features")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6)))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == docs.size)
    for ((id, text) <- docs.take(50)) {
      val d = FakeMedia.decode(text.getBytes("UTF-8"))
      assert(got(id) == ((d.width.toLong, d.height.toLong, d.sumByte,
                          d.nBytes.toLong, d.minByte.toLong,
                          d.maxByte.toLong)),
        s"doc $id")
    }
  }

  test("mm_resize stride-sample agrees with driver-side recomputation " +
       "and halves the stub raster dimensions") {
    val got = SparkEntry.queries("mm_resize")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == docs.size)
    for ((id, text) <- docs.take(50)) {
      val bytes = text.getBytes("UTF-8")
      val out = (0 until bytes.length by 4).map(bytes(_) & 0xff)
      val d = FakeMedia.decode(bytes)
      val expect = (math.max(1, d.width / 2).toLong,
                    math.max(1, d.height / 2).toLong,
                    out.length.toLong, out.map(_.toLong).sum,
                    if (out.isEmpty) 0L else out.min.toLong,
                    if (out.isEmpty) 0L else out.max.toLong,
                    if (out.isEmpty) 0L else out.head.toLong)
      assert(got(id) == expect, s"doc $id")
      assert(got(id)._1 * 2 <= d.width && got(id)._2 * 2 <= d.height)
    }
  }

  test("binary payload column is typed binary and digest-stable") {
    val df = SparkEntry.queries("mm_binary_meta")(spark, sf0001)
    val schema = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("n_bytes") == "bigint")
    assert(schema("content_md5") == "string")
    // md5 over cast-to-binary text equals md5 over the string
    val mismatch = df.join(
        spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id")
      .filter(md5(col("text")) =!= col("content_md5")).count()
    assert(mismatch == 0)
  }

  test("mm_embed_ann composes encode + ANN and honors top-k structure") {
    val rows = SparkEntry.queries("mm_embed_ann")(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((q, rs) <- byQ) {
      assert(rs.length == 3)
      assert(!rs.map(_.getLong(1)).contains(q))
      val scores = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"q=$q")
    }
    // deterministic across runs
    val again = SparkEntry.queries("mm_embed_ann")(spark, sf0001).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }
}
