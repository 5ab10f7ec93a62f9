package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of the engine's surface: a DataFrame builder over the
  * driver testdata plus (when SQL-expressible) a DuckDB oracle. Column names
  * must match between the two — the driver's compare sorts columns by name
  * before hashing.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def all: Seq[GraftQuery]

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
