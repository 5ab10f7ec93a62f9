package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque `binary` columns with
  * typed metadata, decode/feature-extract/frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`FakeMedia.decode`) — the Spark-side
  * plumbing (binary schema, typed Dataset batch shape, per-partition
  * processing, metadata struct outputs) is real and is what these queries
  * exercise. Swapping in a real codec changes one function.
  *
  * Scale: every stage is a pure map over binary payloads — no shuffle, and
  * payload bytes never leave the executor that scanned them. The only
  * shuffled bytes are the small metadata/feature outputs.
  */
object MultimodalQueries extends QueryModule {

  /** Deterministic stand-in for a media decoder: derives "image" dimensions
    * and channel statistics purely from the payload bytes.
    */
  private[graft] object FakeMedia {
    final case class Decoded(width: Int, height: Int, meanByte: Double,
                             minByte: Int, maxByte: Int,
                             sumByte: Long, nBytes: Int)

    /** STUB — a real build would call an image codec here (e.g. TwelveMonkeys
      * / javax.imageio over the byte array). Deterministic fake: dimensions
      * from the byte length, stats from the raw payload.
      */
    def decode(bytes: Array[Byte]): Decoded = {
      val n = bytes.length
      val w = 64 + n % 64
      val h = 64 + (n / 7) % 64
      var sum = 0L
      var mn = 255
      var mx = 0
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        sum += b
        if (b < mn) mn = b
        if (b > mx) mx = b
        i += 1
      }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      Decoded(w, h, mean, if (n == 0) 0 else mn, if (n == 0) 0 else mx,
              sum, n)
    }

    /** STUB encoder — a real build would run an image/text embedding model.
      * Deterministic fake: L2-normalized 16-bin byte histogram.
      */
    def embed(bytes: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      var i = 0
      while (i < bytes.length) {
        h((bytes(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      val norm = math.sqrt(h.map(x => x * x).sum)
      if (norm == 0) h else h.map(_ / norm)
    }
  }

  override def all: Seq[GraftQuery] = Seq(

    // Binary ingestion + metadata: payload bytes, digest, decoded dims.
    // Dims are arithmetic on octet_length → ANSI-expressible ⇒ oracled.
    GraftQuery(
      "mm_binary_meta",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .select(
            col("doc_id"),
            octet_length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("content_md5"))
          .withColumn("width", expr("64 + n_bytes % 64"))
          .withColumn("height", expr("64 + (n_bytes div 7) % 64"))
          .withColumn("n_pixels", col("width") * col("height")),
      Some("""SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5,
        |  64 + octet_length(encode(text)) % 64 AS width,
        |  64 + (octet_length(encode(text)) // 7) % 64 AS height,
        |  (64 + octet_length(encode(text)) % 64)
        |    * (64 + (octet_length(encode(text)) // 7) % 64) AS n_pixels
        |FROM documents""".stripMargin)),

    // Decode + feature extraction through the typed Dataset path: binary
    // payloads mapPartitions'd through the (stubbed) decoder. Rows-only
    // driver check; MultimodalSpec pins the feature values.
    GraftQuery(
      "mm_decode_features",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            // batch shape: one decoded record per payload, decoder state
            // (a real codec's buffers) amortized across the partition
            it.map { case (id, bytes) =>
              val d = FakeMedia.decode(bytes)
              // exact integer features only: a mean would be round(avg(...))
              // which half-rounds differently across engines (the one
              // documented oracle-killer); sum/count carry the same
              // information losslessly
              (id, d.width.toLong, d.height.toLong, d.sumByte,
               d.nBytes.toLong, d.minByte.toLong, d.maxByte.toLong)
            }
          }
          .toDF("doc_id", "width", "height", "sum_byte", "n_bytes",
                "min_byte", "max_byte")
      },
      // the payload is the ASCII text cast to binary, so the oracle can
      // replicate the byte-level stub with code points (= bytes for ASCII;
      // the testdata is verified 7-bit)
      Some("""WITH b AS (
        |  SELECT doc_id, length(text) n,
        |    list_transform(string_split(text, ''), x -> unicode(x)) cs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(64 + n % 64 AS BIGINT) AS width,
        |  CAST(64 + (n // 7) % 64 AS BIGINT) AS height,
        |  CAST(list_sum(cs) AS BIGINT) AS sum_byte,
        |  CAST(n AS BIGINT) AS n_bytes,
        |  CAST(list_min(cs) AS BIGINT) AS min_byte,
        |  CAST(list_max(cs) AS BIGINT) AS max_byte
        |FROM b""".stripMargin)),

    // Full pipeline composition: binary payload → (stubbed) encoder →
    // embedding column → ANN top-3 against query docs. The encoder is the
    // deterministic byte-histogram stand-in for a real image/text encoder;
    // everything downstream (typed Dataset, broadcast ANN, window top-k) is
    // the production shape. The stub is integer arithmetic over ASCII
    // bytes, so DuckDB replicates the whole chain: nibble histogram →
    // L2-normalize → cosine top-3 (same left-to-right float order as
    // graft_cosine — the ann_* queries established the bitwise match).
    GraftQuery(
      "mm_embed_ann",
      (s, dir) => {
        import s.implicits._
        val embedded = t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, bytes) => (id, FakeMedia.embed(bytes)) }
          }
          .toDF("doc_id", "v")
        graft.operators.GraftSimilarity.bruteForceTopK(
          embedded,
          embedded.filter(col("doc_id") < 5)
            .select(col("doc_id").as("q_id"), col("v").as("qv")),
          k = 3, idCol = "doc_id")
      },
      Some("""WITH cs AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), x -> unicode(x) // 16) bins
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    [CAST(len(list_filter(bins, b -> b = i)) AS DOUBLE)
        |     FOR i IN range(0, 16)] raw
        |  FROM cs),
        |nv AS (
        |  SELECT doc_id,
        |    list_transform(raw,
        |      x -> x / sqrt(list_sum(list_transform(raw, y -> y * y)))) v
        |  FROM h),
        |q AS (SELECT doc_id q_id, v qv FROM nv WHERE doc_id < 5),
        |sc AS (SELECT q_id, nv.doc_id n_id, list_cosine_similarity(qv, nv.v) c
        |       FROM q JOIN nv ON nv.doc_id != q_id),
        |r AS (SELECT q_id, n_id, c,
        |        row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) rnk
        |      FROM sc)
        |SELECT q_id, n_id, rnk, round(c, 4) AS cos FROM r WHERE rnk <= 3""".stripMargin)),

    // Resize: nearest-neighbor downsample of the (stubbed) raster — the
    // standard pre-embedding normalization pass. Halving each dimension
    // = keeping every 4th sample of the payload stream; the per-partition
    // byte loop is the real plumbing a resize kernel needs (a real build
    // swaps the stride-sample for bilinear over decoded pixels). Outputs
    // are exact integers (count/sum/min/max of the SURVIVING bytes plus
    // the first surviving byte), so DuckDB replays the stride walk over
    // code points (= bytes on the verified-ASCII corpus).
    GraftQuery(
      "mm_resize",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, bytes) =>
              val n = bytes.length
              val out = new Array[Byte]((n + 3) / 4)
              var i = 0
              while (i < out.length) { out(i) = bytes(4 * i); i += 1 }
              var sum = 0L; var mn = 255; var mx = 0
              var j = 0
              while (j < out.length) {
                val b = out(j) & 0xff
                sum += b
                if (b < mn) mn = b
                if (b > mx) mx = b
                j += 1
              }
              val d = FakeMedia.decode(bytes)
              (id, math.max(1, d.width / 2).toLong,
               math.max(1, d.height / 2).toLong, out.length.toLong, sum,
               if (out.isEmpty) 0L else mn.toLong,
               if (out.isEmpty) 0L else mx.toLong,
               if (out.isEmpty) 0L else (out(0) & 0xff).toLong)
            }
          }
          .toDF("doc_id", "width_out", "height_out", "n_bytes_out",
                "sum_byte_out", "min_byte_out", "max_byte_out", "head_byte")
      },
      Some("""WITH b AS (
        |  SELECT doc_id, length(text) n,
        |    [unicode(x) FOR x IN string_split(text, '')] cs
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n, [cs[i] FOR i IN range(1, n + 1, 4)] rs
        |  FROM b)
        |SELECT doc_id,
        |  CAST(greatest(1, (64 + n % 64) // 2) AS BIGINT) AS width_out,
        |  CAST(greatest(1, (64 + (n // 7) % 64) // 2) AS BIGINT) AS height_out,
        |  CAST(len(rs) AS BIGINT) AS n_bytes_out,
        |  CAST(coalesce(list_sum(rs), 0) AS BIGINT) AS sum_byte_out,
        |  CAST(coalesce(list_min(rs), 0) AS BIGINT) AS min_byte_out,
        |  CAST(coalesce(list_max(rs), 0) AS BIGINT) AS max_byte_out,
        |  CAST(coalesce(rs[1], 0) AS BIGINT) AS head_byte
        |FROM r""".stripMargin)),

    // Frame sampling: payload sliced into 256-byte "frames", every 4th
    // sampled. Counts are arithmetic ⇒ oracled; the ASCII-only corpus makes
    // substring-based first-frame digests byte-exact across engines.
    GraftQuery(
      "mm_frame_sample",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
                  octet_length(col("text").cast("binary")).cast("long")
                    .as("n_bytes"),
                  md5(substring(col("text"), 1, 256)).as("first_frame_md5"))
          .withColumn("n_frames", expr("CAST(ceil(n_bytes / 256.0) AS BIGINT)"))
          .withColumn("n_sampled", expr("CAST(ceil(n_frames / 4.0) AS BIGINT)"))
          .select("doc_id", "n_bytes", "n_frames", "n_sampled", "first_frame_md5"),
      Some("""SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames,
        |  CAST(ceil(ceil(octet_length(encode(text)) / 256.0) / 4.0) AS BIGINT)
        |    AS n_sampled,
        |  md5(substring(text, 1, 256)) AS first_frame_md5
        |FROM documents""".stripMargin)),
  )
}
