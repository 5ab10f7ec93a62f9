package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MaxScore payoff probe (VERDICT r14 missing #3): measures, on the
  * Zipf-head bench fixture ([[graft.queries.TextQueries.skewDocs]] — the
  * stopword-in-every-doc / rare-discriminative-term augmentation of the
  * documents table), the POSTING-ROWS-TRAVERSED and serve-time gap
  * between the exact stored serve and the MaxScore-pruned serve, at
  * whatever scale `SPARK_GRAFT_SF_DIR` points to. The counters are the
  * operator's own frame counts — exactly how ImpactIndexSpec counts them
  * on its constructed skew corpus — surfaced from the BENCH fixture so
  * SCALE.md can cite the payoff, not just the overhead floor. Verifies
  * pruned ≡ stored output before reporting. Prints one JSON line.
  *
  *   runMain graft.ProbeMaxScore [sfDir]
  */
object ProbeMaxScore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.ImpactIndex
    val idx = graft.queries.TextQueries.skewImpactIndex(spark, sfDir)
    val terms = Seq("uncommonmark", "spark", "the")
    // traversal, counted the way the operator builds its frames: the
    // exact serve aggregates EVERY posting of the query terms; the
    // pruned serve only the essential-list candidates' postings
    val allPostings = idx.impactsFor(terms).count()
    val cand = idx.impactsFor(Seq("uncommonmark"))
      .select(col("doc_id")).distinct()
    val prunedPostings = idx.impactsFor(terms)
      .join(cand, Seq("doc_id"), "left_semi").count()
    // answers must agree before any speed claim
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    val stored = key(ImpactIndex.bm25TopKStored(idx, terms, k = 5))
    val pruned = key(ImpactIndex.bm25TopKPruned(idx, terms, k = 5,
                                                essential = 1))
    require(stored == pruned && stored.nonEmpty,
      s"pruned serve diverged: stored=$stored pruned=$pruned")
    def medianSec(body: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    val storedSec = medianSec(
      ImpactIndex.bm25TopKStored(idx, terms, k = 5)
        .write.format("noop").mode("overwrite").save())
    val prunedSec = medianSec(
      ImpactIndex.bm25TopKPruned(idx, terms, k = 5, essential = 1)
        .write.format("noop").mode("overwrite").save())
    println(f"""{"metric":"maxscore_payoff","sf":"$sfDir",""" +
      f""""query_terms":["uncommonmark","spark","the"],"k":5,""" +
      f""""essential":1,"postings_stored":$allPostings,""" +
      f""""postings_pruned":$prunedPostings,""" +
      f""""reduction_x":${allPostings.toDouble / prunedPostings}%.1f,""" +
      f""""stored_sec":$storedSec%.3f,"pruned_sec":$prunedSec%.3f}""")
    spark.stop()
  }
}
