package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file DataSourceV2 — read and write, built directly on the
  * Avro core library (`avro-1.12.1.jar` ships with Spark; the `spark-avro`
  * connector does not ship in this build, so the format capability in the
  * reference's wire vocabulary — `/root/reference/proto/
  * datafusion_common.proto:95-96` — is implemented here from scratch).
  *
  *   spark.read.format("graft.sources.GraftAvroSource").load(dir)
  *   df.write.format("graft.sources.GraftAvroSource")
  *     .option("compression", "deflate").mode("overwrite").save(dir)
  *
  * Supported types: boolean, int, long, float, double, string, binary,
  * date, timestamp (micros), and arrays thereof; nullable columns map to
  * `union(null, T)` both ways.
  *
  * Scale shape: files split on Avro sync markers into ≤ `maxSplitBytes`
  * input splits (option, default 128 MB) — a reader seeks to the first
  * sync point after its split start and stops past its split end, so a
  * single giant container file still reads on many cores and every block
  * is consumed by exactly one split (the classic Hadoop Avro input-split
  * contract). Column pruning is pushed into the Avro decoder via a
  * projected reader schema, so unneeded columns are skipped during
  * decode, not materialized.
  */
class GraftAvroSource extends TableProvider {
  import GraftAvroSource._

  // write path passes the DataFrame's schema instead of inferring
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = pathOf(options)
    val fs = dir.getFileSystem(new Configuration())
    val first = listAvro(fs, dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $dir"))
    val in = new FsInput(first, new Configuration())
    val rdr = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try toSpark(rdr.getSchema)
    finally rdr.close()
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftAvroTable(properties.get("path"), schema)
}

object GraftAvroSource {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): Path = {
    val p = options.get("path")
    require(p != null, "graft-avro requires a path")
    new Path(p)
  }

  private[sources] def listAvro(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath)
      .sortBy(_.getName)

  // ---- schema mapping --------------------------------------------------

  def toAvro(st: StructType, recordName: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable),
                       null, null.asInstanceOf[AnyRef])
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toSeq.asJava)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(elem, containsNull) =>
        Schema.createArray(fieldSchema(elem, containsNull))
      case other =>
        throw new IllegalArgumentException(s"graft-avro cannot write $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  def toSpark(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"graft-avro expects a record top level, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1,
        s"graft-avro supports only (null, T) unions, got $s")
      (toSparkType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
        (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (elem, n) = toSparkType(s.getElementType)
      (ArrayType(elem, containsNull = n), false)
    case other =>
      throw new IllegalArgumentException(s"graft-avro cannot read $other")
  }

  // ---- value conversion ------------------------------------------------

  private[sources] def avroToCatalyst(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case ArrayType(elem, _) =>
        val list = v.asInstanceOf[java.util.Collection[AnyRef]].asScala
        new GenericArrayData(list.map(x => avroToCatalyst(x, elem)).toArray)
      case _ => v // boolean/int/long/float/double, date days, ts micros
    }
  }

  private[sources] def catalystToAvro(row: InternalRow, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case LongType | TimestampType => java.lang.Long.valueOf(row.getLong(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case StringType => row.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case ArrayType(elem, _) => arrayToAvro(row.getArray(i), elem)
      case other =>
        throw new IllegalArgumentException(s"graft-avro cannot write $other")
    }

  private def arrayToAvro(arr: ArrayData, elem: DataType): AnyRef = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) out.add(null)
      else {
        val v: AnyRef = elem match {
          case BooleanType => java.lang.Boolean.valueOf(arr.getBoolean(j))
          case IntegerType | DateType => java.lang.Integer.valueOf(arr.getInt(j))
          case LongType | TimestampType => java.lang.Long.valueOf(arr.getLong(j))
          case FloatType => java.lang.Float.valueOf(arr.getFloat(j))
          case DoubleType => java.lang.Double.valueOf(arr.getDouble(j))
          case StringType => arr.getUTF8String(j).toString
          case BinaryType => java.nio.ByteBuffer.wrap(arr.getBinary(j))
          case ArrayType(e2, _) => arrayToAvro(arr.getArray(j), e2)
          case other =>
            throw new IllegalArgumentException(s"graft-avro cannot write $other")
        }
        out.add(v)
      }
      j += 1
    }
    out
  }
}

private class GraftAvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    require(maxSplit > 0, s"maxSplitBytes must be positive, got $maxSplit")
    new GraftAvroScanBuilder(path, tableSchema, maxSplit)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftAvroWriteBuilder(path, info.schema(),
      Option(info.options.get("compression")).getOrElse("deflate"))
}

// ---- read --------------------------------------------------------------

private class GraftAvroScanBuilder(path: String, full: StructType,
                                   maxSplitBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(new Configuration())
      GraftAvroSource.listAvro(fs, dir)
        .flatMap { p =>
          val len = fs.getFileStatus(p).getLen
          // byte-range splits; the reader syncs to block boundaries, so a
          // block belongs to the split containing its first byte
          (0L until math.max(1L, len) by maxSplitBytes).map { start =>
            GraftAvroFilePartition(p.toString, start,
              math.min(maxSplitBytes, len - start)): InputPartition
          }
        }
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftAvroReaderFactory(required.json)
  }
}

private case class GraftAvroFilePartition(file: String, start: Long,
                                          length: Long) extends InputPartition

private class GraftAvroReaderFactory(requiredJson: String)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val split = p.asInstanceOf[GraftAvroFilePartition]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    // projected reader schema: Avro's schema resolution skips writer fields
    // absent from the reader schema during decode — pruning at the byte level
    val readerSchema = GraftAvroSource.toAvro(required)
    val datum = new GenericDatumReader[GenericRecord](null, readerSchema)
    val in = new FsInput(new Path(split.file), new Configuration())
    val reader = new DataFileReader[GenericRecord](in, datum)
    // the Hadoop Avro split contract: start at the first sync point at or
    // after `start`, stop once past the first sync point at or after `end` —
    // adjacent splits hand off exactly at block boundaries
    reader.sync(split.start)
    val end = split.start + split.length

    new PartitionReader[InternalRow] {
      private var record: GenericRecord = _

      override def next(): Boolean = {
        if (reader.pastSync(end)) return false
        if (!reader.hasNext) return false
        record = reader.next(record)
        true
      }

      override def get(): InternalRow = {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          row.update(i, GraftAvroSource.avroToCatalyst(
            record.get(required(i).name), required(i).dataType))
          i += 1
        }
        row
      }

      override def close(): Unit = reader.close()
    }
  }
}

// ---- write -------------------------------------------------------------

private class GraftAvroWriteBuilder(path: String, schema: StructType,
                                    codec: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftAvroBatchWrite(path, schema, codec, doTruncate)
  }
}

private class GraftAvroBatchWrite(path: String, schema: StructType,
                                  codec: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (truncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    new GraftAvroWriterFactory(path, schema.json, codec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private case class GraftAvroCommit(file: String) extends WriterCommitMessage

private class GraftAvroWriterFactory(path: String, schemaJson: String,
                                     codec: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val sparkSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val avroSchema = GraftAvroSource.toAvro(sparkSchema)
    val file = new Path(path, f"part-$partitionId%05d-$taskId.avro")
    val fs = file.getFileSystem(new Configuration())
    val out = fs.create(file, true)
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    codec match {
      case "none" => ()
      case "snappy" => writer.setCodec(CodecFactory.snappyCodec())
      case _ => writer.setCodec(CodecFactory.deflateCodec(6))
    }
    writer.create(avroSchema, out)

    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, GraftAvroSource.catalystToAvro(
            row, i, sparkSchema(i).dataType))
          i += 1
        }
        writer.append(rec)
      }

      override def commit(): WriterCommitMessage = {
        writer.close()
        GraftAvroCommit(file.toString)
      }

      override def abort(): Unit = {
        try writer.close() catch { case _: Throwable => () }
        try fs.delete(file, false) catch { case _: Throwable => () }
      }

      override def close(): Unit = ()
    }
  }
}
