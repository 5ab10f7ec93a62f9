package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the corpus-curation stages — the
  * incremental twins of [[graft.operators.CorpusCuration]], for the
  * crawl-as-it-arrives shape where re-running batch dedup per increment
  * is the thing to avoid.
  */
object CorpusStreams {

  /** Streaming exact dedup: the FIRST arrival of each content digest
    * passes, later duplicates are dropped — the incremental twin of
    * [[graft.operators.CorpusCuration.exactDedup]] (which keeps one row
    * per digest in batch) and the streaming complement of
    * [[graft.operators.CorpusCuration.incrementalNew]] (which dedups an
    * increment against a static history).
    *
    * State is the digest set, keyed by md5 in the state store (one
    * shuffle on the digest); the event-time watermark bounds it — a
    * duplicate arriving more than `dedupWindow` after its original MAY
    * pass again (state for older digests is reclaimed), the standard
    * bounded-state trade. NULL text digests a sentinel, so null-text rows
    * dedup against each other like any content value.
    */
  def dedupStream(docs: DataFrame, textCol: String = "text",
                  tsCol: String = "ts",
                  dedupWindow: String = "1 hour"): DataFrame =
    docs
      .withColumn("__d", md5(coalesce(col(textCol), lit("\u0000null-text"))))
      .withWatermark(tsCol, dedupWindow)
      .dropDuplicatesWithinWatermark("__d")
      .drop("__d")

  /** Streaming quality gate: the pure-map filter stages apply to a stream
    * unchanged (token-count bounds, stopword ratio) — provided here so
    * stream pipelines compose gate → dedup without importing the batch
    * module's whole surface.
    */
  def qualityGate(docs: DataFrame, textCol: String = "text",
                  minTokens: Int = 20, maxStopRatio: Double = 0.5)
      : DataFrame =
    graft.operators.CorpusCuration.qualityFilter(
      docs, textCol, minTokens, maxStopRatio).drop("tk")

  /** Streaming APPLY side of
    * [[graft.operators.CorpusCuration.temperatureMixture]]: per-source
    * cuts are trained in batch on a reference corpus (pass
    * `temperatureMixture(...)`'s distinct (source, cut) rows, or any
    * curated cut table) and applied to the arriving stream as a
    * stream-static broadcast join + the same 16-bit md5 route filter —
    * a pure map per micro-batch, zero streaming state, identical keep
    * decisions to the batch operator for the same (key, source, cut).
    * Retraining cuts as the corpus drifts is a batch job swap, not a
    * stream restart concern.
    */
  def mixtureGate(docs: DataFrame, cuts: DataFrame,
                  sourceCol: String = "source",
                  keyCol: String = "doc_id"): DataFrame = {
    val route = conv(
      substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10).cast("long")
    docs.join(broadcast(cuts), sourceCol).filter(route < col("cut"))
  }

  /** Streaming APPLY side of
    * [[graft.operators.CorpusCuration.contaminatedDocs]]: flag arriving
    * documents sharing any word-`n`-gram with a STATIC benchmark/test set
    * (the leakage audit, run at ingest instead of per-batch-job). The
    * static side is the distinct test-gram table (train it once in batch);
    * the stream side explodes each arriving doc's distinct grams and
    * stream-static semi-joins them — matched docs collapse back to one
    * row via `dropDuplicatesWithinWatermark` on the id (a doc's gram rows
    * all carry its event time, so the id is unique within the horizon).
    * State is the matched-id set inside the watermark, not the corpus.
    */
  def contaminationGate(docs: DataFrame, testGrams: DataFrame,
                        tsCol: String = "ts", textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 8,
                        dedupWindow: String = "1 hour"): DataFrame = {
    import graft.operators.GraftText
    docs
      .select(col(idCol), col(tsCol),
              GraftText.whitespaceTokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col(idCol), col(tsCol),
              explode(array_distinct(GraftText.wordNGrams(col("__tk"), n)))
                .as("__gram"))
      .join(broadcast(testGrams), Seq("__gram"), "left_semi")
      .withWatermark(tsCol, dedupWindow)
      .dropDuplicatesWithinWatermark(idCol)
      .select(col(idCol), col(tsCol))
  }

  final case class PackDoc(shard: String, doc_id: Long, n_tokens: Long)
  final case class PackAssign(shard: String, doc_id: Long, n_tokens: Long,
                              stream_offset: Long, pack_id: Long)

  /** Streaming twin of [[graft.operators.TrainingPack.packBySize]]: docs
    * arriving on a stream are appended to their shard's token stream and
    * assigned the pack in which they start — state per shard is ONE long
    * (the running token offset), so pack ids keep counting up across
    * micro-batches forever with O(shards) state and no timeout needed.
    *
    * Within a micro-batch a shard's docs are laid out in `doc_id` order;
    * across batches, arrival order IS stream order (the streaming analog
    * of the batch operator's orderCol contract — feed in order for
    * byte-identical batch parity, which StreamingSpec pins).
    */
  def packStream(docs: Dataset[PackDoc], maxTokens: Long)
      : Dataset[PackAssign] = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.NoTimeout) {
        (shard: String, it: Iterator[PackDoc], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = it.toIndexedSeq.sortBy(_.doc_id).map { d =>
            val o = off
            off += d.n_tokens
            PackAssign(shard, d.doc_id, d.n_tokens, o, o / maxTokens)
          }
          state.update(off)
          out.iterator
      }
  }
}
