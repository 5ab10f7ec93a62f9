package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session across all suites (cheap, avoids per-suite JVM spinup).
  * local[4] keeps test shuffles small; scale behavior is exercised by Bench.
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "/tmp/graft_wh")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

abstract class GraftFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sf0001: String = SparkTestBase.sf0001
  def sf001: String = SparkTestBase.sf001
}
