package graft

import graft.implicits._

/** Dev smoke: drives the flagship entry + API validation at the public
  * surface, printing what the driver's t1 smoke would see. Not part of the
  * driver contract; run with `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[4]")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show()
    try spark.range(10).toDF("a").sampleExt(1.5)
    catch { case e: IllegalArgumentException => println("CAUGHT fraction: " + e.getMessage) }
    try spark.range(10).toDF("a").sampleExt(0.5, Some(-3L))
    catch { case e: IllegalArgumentException => println("CAUGHT seed: " + e.getMessage) }
    println("EXPLAIN of entry:")
    df.explain("formatted")
    spark.stop()
  }
}
