package graft
import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Queries are forced through the noop sink — full
  * computation (sorts, projections, writes) without driver-side collect
  * skew; a warmup query first so JIT/codegen compilation doesn't land on
  * whichever query runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan + shuffle + codegen paths once
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // optional arg: comma-separated query names to run (iteration aid;
    // the driver passes no args and gets the full suite)
    val only = args.headOption.map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // a failed query records -1, never a (fast-looking) wall time
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Full per-query detail first (a ~4 KB line — for humans and the
    // judge's per-query log)...
    println(s"""{"metric":"full","unit":"sec","queries":${toJson(results)},"failed":$failed,"sf":"$sfDir"}""")
    // ...then the driver-contract line LAST and COMPACT: the driver keeps
    // only a 2000-char output tail, so the final JSON line must fit inside
    // it whole (the full map above does not — r1-r3 all recorded
    // parsed:null because of exactly this).
    val headlineSet: Set[String] = Set(
      "q1_agg", "q3_join_agg", "q5_multi_join", "q_filter_topk",
      "q_window_rank", "q_sort_global", "q_percentile_exact",
      "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
      "dedup_embedding_cosine", "dedup_components", "dedup_semantic",
      "pipeline_sequence_pack", "text_bm25_topk",
      "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_append",
      "ann_quantized_topk",
      "text_vocab_tfidf", "text_quality_rules",
      "events_sessionize", "events_asof_join", "events_range_join",
      "pipeline_corpus_curation", "pipeline_contamination",
      "mm_embed_ann", "sample_bernoulli", "src_bucketed_join",
      "text_lm_perplexity", "pipeline_data_mixture", "text_scrub_repeats")
    val headline = results.filter(r => headlineSet.contains(r._1))
    val contract = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":${toJson(headline)},"failed":$failed,"sf":"$sfDir"}"""
    // Belt and braces against log-tail truncation (BENCH_r03 lost its
    // totals to exactly that): the contract line also lands in a FILE the
    // judge can always read, before stdout gets a chance to truncate.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/bench_last.json"),
      contract + "\n" +
        s"""{"metric":"full","unit":"sec","queries":${toJson(results)},"failed":$failed,"sf":"$sfDir"}""" + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_last.json write failed: ${e.getMessage}")
    }
    println(contract)
    spark.stop()
  }
}
