package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.XorShift64Star

/** Custom DataSourceV2: a deterministic synthetic-row generator —
  * `spark.read.format("graft.sources.GraftSynthSource")
  *   .option("rows", n).option("partitions", p).load()`.
  *
  * The source-extension leg of the pattern (the reference only consumes the
  * built-in parquet source; this shows the Spark-native way to ADD one):
  * TableProvider → Table → ScanBuilder → Batch → PartitionReaderFactory,
  * with column pruning pushed into the reader
  * (`SupportsPushDownRequiredColumns`).
  *
  * Scale shape: `partitions` input splits, each generating its row range
  * independently on its executor from (seed, rowId) — no driver data, no
  * shuffle, columns never materialized unless read.
  */
class GraftSynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSynthSource.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("seed", "42").toLong)
}

object GraftSynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private class GraftSynthTable(rows: Long, parts: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows rows, $parts parts)"
  override def schema(): StructType = GraftSynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSynthScanBuilder(rows, parts, seed)
}

private class GraftSynthScanBuilder(rows: Long, parts: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GraftSynthSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (rows + parts - 1) / parts)
      (0 until parts).map { p =>
        val start = p * per
        GraftSynthPartition(start, math.min(start + per, rows))
          .asInstanceOf[InputPartition]
      }.filter { case GraftSynthPartition(s, e) => s < e }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftSynthReaderFactory(seed, required)
  }
}

private case class GraftSynthPartition(start: Long, end: Long)
    extends InputPartition

private class GraftSynthReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val GraftSynthPartition(start, end) = p
    new PartitionReader[InternalRow] {
      private var id = start - 1
      private val cols = required.fieldNames

      override def next(): Boolean = { id += 1; id < end }

      override def get(): InternalRow = {
        // per-row deterministic draw: f(seed, id), independent of partition
        // layout so repartitioned reads agree
        val rng = new XorShift64Star(seed ^ id)
        val value = rng.nextDouble() * 100.0
        val row = new GenericInternalRow(cols.length)
        var i = 0
        while (i < cols.length) {
          cols(i) match {
            case "id" => row.update(i, id)
            case "bucket" => row.update(i, (id % 16).toInt)
            case "value" => row.update(i, value)
            case "tag" => row.update(i, UTF8String.fromString(s"tag${id % 4}"))
          }
          i += 1
        }
        row
      }

      override def close(): Unit = ()
    }
  }
}
