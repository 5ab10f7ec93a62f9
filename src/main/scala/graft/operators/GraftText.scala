package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks — the library form of the
  * `text_*` catalog queries. Everything here is pure `functions._` /
  * higher-order-function Columns: codegen-friendly, no UDFs, zero shuffle —
  * at 100 TB these are free map stages fused into whole-stage codegen.
  */
object GraftText {

  /** English stopword markers used by the quality/language heuristics. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Whitespace tokens of `text` (leading/trailing space trimmed first). */
  def whitespaceTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace-normalized lowercase form — the canonical string for
    * fingerprinting and exact dedup.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** md5 fingerprint of the normalized text. */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** md5 of the first `n` normalized chars — prefix-block dedup key. */
  def headFingerprintMd5(text: Column, n: Int = 64): Column =
    md5(substring(normalized(text), 1, n))

  /** BPE-ish token count: letter runs | digit runs | single punctuation. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** How many tokens of `tk` appear in `markers` (stopword/marker score). */
  def markerScore(tk: Column, markers: Seq[String]): Column =
    size(filter(tk, x => x.isInCollection(markers))).cast("long")

  /** Marker-count / token-count ratio (e.g. stopword ratio). */
  def markerRatio(tk: Column, markers: Seq[String], scale: Int = 4): Column =
    round(size(filter(tk, x => x.isInCollection(markers))) / size(tk), scale)

  /** Mean token length, `scale` decimals. */
  def meanTokenLen(tk: Column, scale: Int = 4): Column =
    round(aggregate(tk, lit(0L), (acc, x) => acc + length(x)) / size(tk),
          scale)

  /** Total characters across tokens. */
  def tokenChars(tk: Column): Column =
    aggregate(tk, lit(0L), (acc, x) => acc + length(x))

  /** Word n-grams of the token array as space-joined strings (positions
    * beyond the end yield shorter tails for arrays with fewer than `n`
    * tokens — callers filter short docs first, as the catalog does).
    */
  def wordNGrams(tk: Column, n: Int): Column =
    transform(sequence(lit(0), size(tk) - n),
              i => concat_ws(" ", (0 until n).map(j => element_at(
                tk, (i + j + 1).cast("int"))): _*))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS local document fingerprinting algorithm): hash every word
    * `k`-gram, slide a window of `w` consecutive gram hashes, select the
    * MINIMUM hash of each window, return the sorted distinct selections.
    * The winnowing guarantee: any shared token run of length >= `w+k-1`
    * between two documents surfaces as at least one shared fingerprint,
    * while only ~`2/(w+1)` of gram hashes are kept — the density/recall
    * dial of plagiarism-and-overlap detection at corpus scale.
    *
    * Pure higher-order-function projection — no shuffle, no UDF; a
    * downstream `explode` + equi-join on the fingerprint value is the
    * overlap-mining stage (the [[CorpusCuration.contaminatedDocs]] join
    * shape, at winnowed density instead of every-gram density). Gram
    * hashes are `xxhash64` of the space-joined gram STRING (signed
    * longs, so a SQL engine replays the selection after mapping its
    * unsigned hash replay onto the signed order). Documents with fewer
    * than `k` tokens yield NULL (no gram exists); with fewer than `w`
    * grams the whole document is one window (the paper's convention).
    */
  def winnowFingerprints(tk: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, s"winnowFingerprints: k=$k, w=$w must be >= 1")
    val ghExpr = transform(sequence(lit(1), size(tk) - (k - 1)),
      i => xxhash64(concat_ws(" ", (0 until k).map(j =>
        element_at(tk, i + j)): _*)))
    // TWO cost traps this shape dodges, both measured at sf0.1:
    //  - the gram-hash array is BOUND ONCE per row as a lambda variable
    //    (transform over a 1-element array): referencing it as a plain
    //    subexpression inside the window lambda makes Catalyst re-run
    //    the whole gram transform per window position — O(n²·w) per doc,
    //    35 s where this projection costs ~1 s;
    //  - the window minimum is a w-ary least() of direct element
    //    accesses, not slice()+array_min — a per-position w-element
    //    array allocation the hot loop does not need.
    val out = element_at(
      transform(array(ghExpr), g => {
        val sel =
          if (w == 1) g
          else when(size(g) >= w,
              transform(sequence(lit(1), size(g) - (w - 1)),
                j => least((0 until w).map(i => element_at(g, j + i)): _*)))
            .otherwise(array(array_min(g)))
        array_sort(array_distinct(sel))
      }), 1)
    when(size(tk) >= k, out)
  }

  /** Overlapping token windows of width `window` every `stride` tokens —
    * the doc→chunk explode feeding embedding/retrieval pipelines. Chunk i
    * covers tokens [i·stride, i·stride + window); the last chunk may be
    * shorter; a doc with ≤ `window` tokens yields exactly one chunk (its
    * whole token array; empty-token docs yield one empty chunk — callers
    * filter empties first, as the catalog does). Returns an ARRAY of
    * space-joined chunk strings; explode with `posexplode` for
    * (chunk_idx, chunk) rows. Pure map — codegen'd, zero shuffle.
    */
  def chunkWindows(tk: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val lastStart = // index of the final chunk's first token
      ceil((greatest(size(tk) - window, lit(0))).cast("double") / stride)
        .cast("int")
    transform(sequence(lit(0), lastStart),
              i => concat_ws(" ", slice(tk, i * stride + 1, lit(window))))
  }

  /** Duplicate word-n-gram ratio — the intra-document repetition signal
    * (Gopher/C4 "repeated paragraphs" heuristic at word granularity).
    */
  def repetitionRatio(tk: Column, n: Int = 3, scale: Int = 4): Column = {
    val grams = wordNGrams(tk, n)
    round((size(grams) - size(array_distinct(grams))).cast("double") /
          size(grams), scale)
  }

  /** Language-ID from per-language marker scores: highest score wins,
    * earlier argument wins ties, zero-everything → "und". The argument
    * order is the deterministic priority order.
    */
  def langIdFrom(scores: Seq[(String, Column)]): Column = {
    require(scores.nonEmpty, "langIdFrom needs at least one (lang, score)")
    val cascade = scores.zipWithIndex.foldLeft(
        when(lit(false), lit("und"))) { case (acc, ((lang, score), i)) =>
      val laterMax = scores.drop(i + 1).map(_._2) match {
        case Nil => lit(0L)
        case one :: Nil => one
        case many => greatest(many: _*)
      }
      acc.when(score >= laterMax && score > 0, lang)
    }
    cascade.otherwise("und")
  }
}
