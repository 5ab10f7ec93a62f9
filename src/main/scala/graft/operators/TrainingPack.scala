package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign variable-length
  * documents to fixed-capacity context windows ("packs") without splitting
  * documents, the preprocessing step between a curated corpus and an LLM
  * data loader.
  *
  * The rule is stream packing: documents are laid out in `orderCol` order
  * as one token stream (per shard, if `shardCols` are given) and a document
  * belongs to the pack in which it STARTS — `pack_id =
  * floor(exclusive_cumsum(tokens) / maxTokens)`. A document that straddles
  * a pack boundary overflows its pack by at most its own length (standard
  * best-effort, boundary-preserving packing; utilization ≈ 1 −
  * avg_doc/2·maxTokens). Deterministic for a given order column, exactly
  * reproducible in any engine with window cumsum — no RNG, no
  * partition-dependence.
  *
  * Scale shape: one window cumsum per shard. UNSHARDED, that is a global
  * range sort — correct but serial in the final stage; at 100 TB always
  * pass `shardCols` (language, source, date bucket...) so each shard packs
  * independently in parallel and pack ids are per-shard. Downstream
  * loaders consume (shard, pack_id) groups.
  */
object TrainingPack {

  /** Per-document pack assignment: all input columns plus
    *   - `stream_offset` — exclusive cumsum of `tokenCol` in stream order
    *   - `pack_id`      — floor(stream_offset / maxTokens), per shard
    *
    * @param tokenCol per-document token count (precomputed — packing must
    *                 not re-tokenize)
    * @param orderCol total order within a shard (document id, curriculum
    *                 score...); ties under a non-unique order column would
    *                 make offsets nondeterministic, so pass a unique one
    */
  def packBySize(docs: DataFrame, tokenCol: String, orderCol: String,
                 maxTokens: Long, shardCols: Seq[String] = Nil): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val w0 = if (shardCols.isEmpty) Window.orderBy(col(orderCol))
             else Window.partitionBy(shardCols.map(col): _*)
                        .orderBy(col(orderCol))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("stream_offset",
        (sum(col(tokenCol)).over(w) - col(tokenCol)).cast("long"))
      .withColumn("pack_id",
        floor(col("stream_offset") / maxTokens).cast("long"))
  }

  /** Pack-level summary of [[packBySize]]: one row per (shard, pack) with
    * document and token counts — the "how full are my context windows"
    * audit. `n_tokens` can exceed `maxTokens` by at most the last
    * document's overflow (see class doc).
    */
  def packSummary(packed: DataFrame, tokenCol: String,
                  shardCols: Seq[String] = Nil): DataFrame =
    packed
      .groupBy((shardCols :+ "pack_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
           sum(col(tokenCol)).cast("long").as("n_tokens"))
}
