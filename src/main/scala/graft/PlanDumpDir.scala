package graft

/** Dumps `.explain("formatted")` output for a comma-separated list of
  * declared queries, one `<name>.txt` per query, into a directory —
  * the per-round before/after plan evidence (`plans/r<N>/`).
  * Usage: `runMain graft.PlanDumpDir <outDir> <name1,name2,...> [sfDir]`.
  */
object PlanDumpDir {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = GraftSession.getOrCreate("local[8]")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val qe = org.apache.spark.sql.GraftSqlBridge.queryExecution(df)
      val txt = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode).trim
        .replace("\u0000", "\\u0000")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), txt + "\n")
      println(s"WROTE $outDir/$name.txt")
    }
    spark.stop()
  }
}
