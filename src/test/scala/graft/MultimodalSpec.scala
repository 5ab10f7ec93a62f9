package graft

import org.apache.spark.sql.functions._

import graft.operators.GraftMedia

/** Multimodal pipeline: REAL `javax.imageio` decode (BMP and PNG), true
  * bilinear resize over decoded pixels, golden-pixel contracts, and
  * agreement between the typed-Dataset query path and direct computation.
  */
class MultimodalSpec extends GraftFunSuite {

  private def roundTrip(bytes: Array[Byte]): GraftMedia.Raster =
    GraftMedia.decodeGray(GraftMedia.encodeBmp(GraftMedia.payloadRaster(bytes)))

  test("golden pixels: the BMP encode/decode round-trip reproduces the " +
       "payload raster exactly, and the PNG codec path decodes " +
       "pixel-identically (the decode is format-real, not byte-trusting)") {
    val payload = "The quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val expected = GraftMedia.payloadRaster(payload)
    val viaBmp = roundTrip(payload)
    assert(viaBmp.width == expected.width && viaBmp.height == expected.height)
    assert(viaBmp.pixels.toSeq == expected.pixels.toSeq,
      "BMP decode must reproduce every payload pixel (lossless round-trip)")
    val viaPng = GraftMedia.decodeGray(GraftMedia.encodePng(expected))
    assert(viaPng.pixels.toSeq == viaBmp.pixels.toSeq &&
           viaPng.width == viaBmp.width,
      "the PNG and BMP codec paths must decode identical pixels")
    // hand-computed golden pixels: payload byte i is pixel (i / w, i % w)
    val w = GraftMedia.rasterWidth(payload.length)
    assert(viaBmp.pixels(0) == 'T'.toInt)
    assert(viaBmp.pixels(w) == (payload(w) & 0xff))
    assert(viaBmp.pixels.last == 0 ||
           payload.length == viaBmp.pixels.length,
      "the padded tail (if any) must decode as zeros")
    // undecodable bytes fail loudly, never flow as zeros
    intercept[IllegalArgumentException] {
      GraftMedia.decodeGray("not an image".getBytes("UTF-8"))
    }
  }

  test("decode fast path: bulk band-0 getSamples equals the per-pixel " +
       "getRGB conversion on component images, and palette (indexed) " +
       "images take the exact fallback — band 0 there is a palette " +
       "index, not red") {
    // reference decode: always the per-pixel color-model conversion
    def refDecode(bytes: Array[Byte]): Seq[Int] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      (0 until img.getHeight).flatMap(y => (0 until img.getWidth).map(x =>
        (img.getRGB(x, y) >> 16) & 0xff))
    }
    val payload = (0 until 257).map(i => (i * 37 % 256).toByte).toArray
    val raster = GraftMedia.payloadRaster(payload)
    for (bytes <- Seq(GraftMedia.encodeBmp(raster),
                      GraftMedia.encodePng(raster))) {
      assert(GraftMedia.decodeGray(bytes).pixels.toSeq == refDecode(bytes),
        "bulk fast path must equal the per-pixel conversion")
    }
    // palette image: encode through the JDK GIF writer (indexed color
    // model); decodeGray must still return the RED channel, i.e. agree
    // with getRGB, NOT the raw palette indices
    val img = new java.awt.image.BufferedImage(
      raster.width, raster.height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until raster.height; x <- 0 until raster.width) {
      val g = raster.pixels(y * raster.width + x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos),
      "JDK GIF encoder unavailable")
    val gif = bos.toByteArray
    assert(GraftMedia.decodeGray(gif).pixels.toSeq == refDecode(gif),
      "indexed images must decode via the color model, not raw band 0")
  }

  test("animated GIF container: the codec's own frame index counts the " +
       "frames, sampled frames decode pixel-exactly (identity-palette " +
       "LZW is lossless), and non-sampled frames are never materialized") {
    val payload = (0 until 1000).map(i => (i * 13 % 128).toByte).toArray
    val frames = GraftMedia.payloadFrames(payload)
    assert(frames.length == 4, "1000 bytes = 4 frames of 256")
    val gif = GraftMedia.encodeGif(frames)
    // the REAL reader's index, not our arithmetic
    val (n, sampled) = GraftMedia.decodeSampledFrames(gif, sampleEvery = 4)
    assert(n == 4 && sampled.length == 1)
    assert(sampled.head.pixels.toSeq == frames.head.pixels.toSeq,
      "sampled frame must round-trip bit-exactly through the GIF codec")
    val (n2, all) = GraftMedia.decodeSampledFrames(gif, sampleEvery = 1)
    assert(n2 == 4 &&
      all.map(_.pixels.toSeq) == frames.map(_.pixels.toSeq),
      "every frame must round-trip (losslessness is per-frame)")
    // empty payload: one all-zero frame, still a decodable container
    val (n0, s0) = GraftMedia.decodeSampledFrames(
      GraftMedia.encodeGif(GraftMedia.payloadFrames(Array.empty)), 4)
    assert(n0 == 1 && s0.head.pixels.forall(_ == 0))
    intercept[IllegalArgumentException] {
      GraftMedia.decodeSampledFrames("not a gif".getBytes("UTF-8"), 1)
    }
  }

  test("WAV audio: AudioSystem parses the file's own fmt chunk (rate, " +
       "width, channels), PCM samples round-trip bit-exactly, and " +
       "audio stats match hand computation") {
    val payload = "Hello, waveform! aAzZ".getBytes("UTF-8")
    val samples = GraftMedia.payloadSamples(payload)
    val wav = GraftMedia.encodeWav(samples)
    // RIFF magic proves a real container, not raw PCM
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
           new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, decoded) = GraftMedia.decodeWav(wav)
    assert(rate == 8000.0f, "sample rate must come from the decoded header")
    assert(decoded.toSeq == samples.toSeq,
      "PCM must round-trip bit-exactly")
    val st = GraftMedia.audioStats(decoded)
    assert(st.nSamples == payload.length)
    assert(st.sumAbs ==
      payload.map(b => math.abs(((b & 0xff) - 96) * 128).toLong).sum)
    assert(st.peak == payload.map(b =>
      math.abs(((b & 0xff) - 96) * 128)).max)
    // hand-count strict sign changes
    val signs = samples.toSeq
    val zc = signs.zip(signs.tail).count { case (a, b) => a.toLong * b < 0 }
    assert(st.zeroCrossings == zc)
    // zero-length audio: a valid (empty) WAV, zero stats
    val (_, empty) = GraftMedia.decodeWav(GraftMedia.encodeWav(Array.empty))
    assert(empty.isEmpty &&
      GraftMedia.audioStats(empty) == GraftMedia.AudioStats(0, 0, 0, 0))
    intercept[Exception] {
      GraftMedia.decodeWav("not audio at all".getBytes("UTF-8"))
    }
  }

  test("JPEG decode path: the lossy codec decodes through the same " +
       "entry point — exact dimensions, pixels within compression " +
       "tolerance (pinning the scaladoc's BMP/PNG/GIF/JPEG claim)") {
    val payload = (0 until 300).map(i => (i % 97).toByte).toArray
    val raster = GraftMedia.payloadRaster(payload)
    val img = new java.awt.image.BufferedImage(
      raster.width, raster.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until raster.height; x <- 0 until raster.width) {
      val g = raster.pixels(y * raster.width + x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpeg", bos),
      "JDK JPEG encoder unavailable")
    val got = GraftMedia.decodeGray(bos.toByteArray)
    assert(got.width == raster.width && got.height == raster.height,
      "JPEG decode must preserve dimensions exactly")
    val maxErr = got.pixels.zip(raster.pixels).map {
      case (a, b) => math.abs(a - b)
    }.max
    assert(maxErr <= 48,
      s"JPEG round-trip error $maxErr implausibly large for near-flat " +
      "gray content — the decode path is broken, not just lossy")
  }

  test("bilinear half kernel: hand-computed 2x2 block means, integer " +
       "floor, edge clamp at dimension 1") {
    // 4x2 raster: blocks {10,20,30,40} -> 25 and {1,2,3,5} -> 2 (floor 11/4)
    val r = GraftMedia.Raster(4, 2, Array(10, 20, 1, 2, 30, 40, 3, 5))
    val h = GraftMedia.bilinearHalf(r)
    assert(h.width == 2 && h.height == 1)
    assert(h.pixels.toSeq == Seq(25, 2))
    // height-1 raster: the y+1 sample clamps to the only row
    val one = GraftMedia.Raster(4, 1, Array(8, 12, 100, 50))
    val oh = GraftMedia.bilinearHalf(one)
    assert(oh.height == 1 && oh.pixels.toSeq == Seq(10, 75))
    // odd width drops the trailing column (floor halving)
    val odd = GraftMedia.bilinearHalf(GraftMedia.Raster(3, 2,
      Array(1, 2, 99, 3, 4, 99)))
    assert(odd.width == 1 && odd.pixels.toSeq == Seq(2))
  }

  test("mm_decode_features agrees with driver-side real decode") {
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
      val st = GraftMedia.stats(roundTrip(text.getBytes("UTF-8")))
      assert(got(id) == ((st.width.toLong, st.height.toLong, st.sumPix,
                          st.nPix.toLong, st.minPix.toLong,
                          st.maxPix.toLong)),
        s"doc $id")
    }
  }

  test("mm_resize bilinear agrees with driver-side recomputation and " +
       "halves the decoded raster") {
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
      val full = roundTrip(text.getBytes("UTF-8"))
      val half = GraftMedia.bilinearHalf(full)
      val st = GraftMedia.stats(half)
      val expect = (st.width.toLong, st.height.toLong, st.nPix.toLong,
                    st.sumPix, st.minPix.toLong, st.maxPix.toLong,
                    half.pixels.headOption.getOrElse(0).toLong)
      assert(got(id) == expect, s"doc $id")
      assert(st.width * 2 <= full.width + 1 && st.height * 2 <= full.height + 1)
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

  test("mm_embed_ann composes real decode + encode + ANN and honors " +
       "top-k structure") {
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

  test("meanHash64: hand-computed block-vs-global bits on an 8x8 raster; " +
       "one flipped pixel flips exactly its block's bit; hammingPairs64 " +
       "pairs the exact re-upload at hamming 0 and the near-dup at 1") {
    import spark.implicits._
    // 8x8: left half 0, right half 255 — cells are single pixels, global
    // sum 32*255 = 8160; bit(i,j) = px*64 > 8160 ⇔ px = 255 ⇔ j >= 4
    val half = GraftMedia.Raster(8, 8, Array.tabulate(64)(k =>
      if (k % 8 >= 4) 255 else 0))
    assert(GraftMedia.meanHash64(half) == 0xF0F0F0F0F0F0F0F0L)
    // flip pixel (0, 3) to 255: its own bit turns on (255*64 > 8415),
    // every other comparison keeps its side — hamming exactly 1
    val near = GraftMedia.Raster(8, 8, half.pixels.updated(3, 255))
    val hNear = GraftMedia.meanHash64(near)
    assert(java.lang.Long.bitCount(
      GraftMedia.meanHash64(half) ^ hNear) == 1)
    // empty / uniform raster: no cell exceeds the global mean → hash 0
    assert(GraftMedia.meanHash64(
      GraftMedia.Raster(4, 2, Array.fill(8)(7))) == 0L)
    // the shared banded pairer over precomputed hashes: exact twin at
    // hamming 0, near-dup at 1, both found (1 diff bit leaves 3 of 4
    // bands colliding); an unrelated all-dark raster pairs with nothing
    val far = GraftMedia.Raster(8, 8, Array.tabulate(64)(k =>
      if (k % 8 < 4) 255 else 0)) // mirrored: hamming 64 from `half`
    val hashes = Seq(
      (1L, GraftMedia.meanHash64(half)),
      (2L, GraftMedia.meanHash64(half)),
      (3L, hNear),
      (4L, GraftMedia.meanHash64(far))).toDF("doc_id", "h64")
    val pairs = graft.operators.GraftDedup
      .hammingPairs64(hashes, "doc_id", "h64", maxHamming = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)), pairs)
  }

  test("audioHash64: monotone energies set every bit, reversed clear " +
       "them; the hash is invariant under amplitude scaling; a local " +
       "perturbation flips at most its two adjacent comparisons") {
    // 130 samples, |s| = frame index (2 samples per frame): energies
    // strictly rise frame to frame → all 64 comparisons true
    val rising = Array.tabulate(130)(i => i / 2)
    assert(GraftMedia.audioHash64(rising) == -1L) // all 64 bits
    assert(GraftMedia.audioHash64(rising.reverse) == 0L)
    // comparison-of-sums: positive scaling cannot change any bit
    val text = Array.tabulate(130)(i => (i * 37 % 61) - 30)
    val h = GraftMedia.audioHash64(text)
    assert(GraftMedia.audioHash64(text.map(_ * 3)) == h)
    // a one-frame perturbation flips at most the two comparisons that
    // read that frame's energy
    val bumped = text.clone(); bumped(10) = bumped(10) + 500 // frame 5
    val flipped = java.lang.Long.bitCount(
      GraftMedia.audioHash64(bumped) ^ h)
    assert(flipped <= 2, s"flipped=$flipped")
    // degenerate inputs: empty and shorter-than-frame-count streams are
    // deterministic (empty frames carry energy 0)
    assert(GraftMedia.audioHash64(Array.empty[Int]) == 0L)
    GraftMedia.audioHash64(Array(5, -3)) // no throw
  }

  test("videoHash64: the factored delta-energy kernel over the sampled " +
       "frames' pixel stream — brightness-scaling invariant, local edits " +
       "flip only adjacent comparisons, unsampled frames never matter") {
    // deterministic 3-frame clip (256 bytes per frame, values 0..127)
    def frame(seed: Int): GraftMedia.Raster =
      GraftMedia.Raster(16, 16,
        Array.tabulate(256)(i => (i * 7 + seed * 31) % 128))
    val clip = Seq(frame(1), frame(2), frame(3))
    val h = GraftMedia.videoHash64(clip)
    // the factored-kernel identity: videoHash64 IS audioHash64 of the
    // concatenated raster scans (pixels nonnegative, |x| = x)
    assert(h == GraftMedia.audioHash64(
      clip.flatMap(_.pixels).toArray))
    // comparison-of-sums: uniform brightness scaling flips nothing
    val brighter = clip.map(r => r.copy(pixels = r.pixels.map(_ * 2)))
    assert(GraftMedia.videoHash64(brighter) == h)
    // …and a uniform brightness SHIFT is NEAR-invariant: segment counts
    // differ by at most one pixel (768 px over 65 segments), so a +k
    // offset nudges adjacent-sum differences by at most ±k — only
    // near-tie comparisons can flip. This is the robustness that makes
    // ScaleUp's rotation cipher produce signature-clones across copies
    // (the sf1 clone-flood adjudication in SCALE.md: by design, not a
    // defect)
    val shifted = clip.map(r => r.copy(pixels = r.pixels.map(_ + 7)))
    assert(java.lang.Long.bitCount(GraftMedia.videoHash64(shifted) ^ h) <= 2,
      "a uniform shift must stay within near-tie flips")
    // a 4-pixel local edit sits in at most 2 adjacent segments of the
    // 768-pixel stream → at most 2 comparisons flip (the perturbed-twin
    // bound the mm_video_dedup augmentation relies on)
    val edited = clip.head.pixels.clone()
    (0 until 4).foreach(i => edited(i) = 127 - edited(i))
    val h2 = GraftMedia.videoHash64(
      clip.head.copy(pixels = edited) +: clip.tail)
    assert(java.lang.Long.bitCount(h ^ h2) <= 2,
      s"flipped=${java.lang.Long.bitCount(h ^ h2)}")
    // FRAME SAMPLING composition: through the real GIF container with
    // sampleEvery = 2, corrupting an UNSAMPLED (odd) frame leaves the
    // hash untouched; corrupting a sampled frame moves it
    val bytes = Array.tabulate(768)(i => ((i * 13) % 96 + 32).toByte)
    def hashOf(b: Array[Byte]): Long = {
      val gif = GraftMedia.encodeGif(GraftMedia.payloadFrames(b))
      val (n, sampled) = GraftMedia.decodeSampledFrames(gif, sampleEvery = 2)
      assert(n == 3 && sampled.length == 2)
      GraftMedia.videoHash64(sampled)
    }
    val base = hashOf(bytes)
    val oddCorrupt = bytes.clone()
    (256 until 320).foreach(i => oddCorrupt(i) = 127)   // frame 1: unsampled
    assert(hashOf(oddCorrupt) == base,
      "an unsampled frame's bytes must not reach the signature")
    val evenCorrupt = bytes.clone()
    (512 until 576).foreach(i => evenCorrupt(i) = 127)  // frame 2: sampled
    assert(hashOf(evenCorrupt) != base)
    // geometry guard: at least one frame
    intercept[IllegalArgumentException] {
      GraftMedia.videoHash64(Nil)
    }
  }
}
