package graft.sources

import java.nio.ByteBuffer
import java.nio.channels.SeekableByteChannel
import java.util
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
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

/** Arrow IPC file-format DataSourceV2 — read and write, built directly on
  * the Arrow vector library that ships with Spark (`arrow-vector-18.3.0`;
  * Spark uses it internally for Python interchange but exposes no Arrow
  * FILE source). Closes the last row of the reference's format vocabulary
  * (`/root/reference/proto/datafusion_common.proto:95-96` lists
  * CSV, Parquet, Avro, NDJSON and ARROW) alongside [[GraftAvroSource]].
  *
  *   spark.read.format("graft.sources.GraftArrowSource").load(dir)
  *   df.write.format("graft.sources.GraftArrowSource")
  *     .option("batchSize", "4096").mode("overwrite").save(dir)
  *
  * Supported types: boolean, int, long, float, double, string, binary,
  * date, timestamp (micros, UTC), and arrays of int/long/float/double/
  * string; nullable columns map to nullable Arrow fields both ways.
  *
  * Scale shape: the write side emits one file per task with one record
  * batch per `batchSize` rows; the read side splits each file at RECORD
  * BATCH granularity using the IPC footer's block index — batches are
  * packed greedily into ≤ `maxSplitBytes` splits (default 128 MB), so a
  * single giant IPC file reads on many cores and every batch is read by
  * exactly one split. Column pruning happens at vector-decode time: only
  * required columns are converted to rows (the IPC reader materializes
  * whole batches — per-column byte skipping would need a footer-offset
  * reader, which the classpath API does not expose; noted, not hidden).
  */
class GraftArrowSource extends TableProvider {
  import GraftArrowSource._

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = pathOf(options)
    val fs = dir.getFileSystem(new Configuration())
    val first = listArrow(fs, dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .arrow files under $dir"))
    withReader(fs, first) { reader => toSpark(reader.getVectorSchemaRoot.getSchema) }
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftArrowTable(properties.get("path"), schema)
}

object GraftArrowSource {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): Path = {
    val p = options.get("path")
    require(p != null, "graft-arrow requires a path")
    new Path(p)
  }

  private[sources] def listArrow(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".arrow"))
      .map(_.getPath)
      .sortBy(_.getName)

  private[sources] def withReader[T](fs: FileSystem, file: Path)
      (f: ArrowFileReader => T): T = {
    val alloc = new RootAllocator(Long.MaxValue)
    val in = fs.open(file)
    val len = fs.getFileStatus(file).getLen
    val reader = new ArrowFileReader(new FsSeekableChannel(in, len), alloc)
    try f(reader)
    finally { reader.close(); alloc.close() }
  }

  /** Hadoop FSDataInputStream as a SeekableByteChannel (the Arrow IPC
    * reader's input contract). Reads go through a byte-array bounce so the
    * local RawLocalFileSystem (no ByteBufferReadable) works too.
    */
  private[sources] final class FsSeekableChannel(in: FSDataInputStream,
                                                 len: Long)
      extends SeekableByteChannel {
    private var open = true
    override def read(dst: ByteBuffer): Int = {
      val buf = new Array[Byte](dst.remaining())
      val n = in.read(buf, 0, buf.length)
      if (n > 0) dst.put(buf, 0, n)
      n
    }
    override def write(src: ByteBuffer): Int =
      throw new UnsupportedOperationException("read-only channel")
    override def position(): Long = in.getPos
    override def position(newPosition: Long): SeekableByteChannel = {
      in.seek(newPosition); this
    }
    override def size(): Long = len
    override def truncate(size: Long): SeekableByteChannel =
      throw new UnsupportedOperationException("read-only channel")
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  // ---- schema mapping --------------------------------------------------

  def toArrow(st: StructType): ASchema =
    new ASchema(st.fields.map(f => toArrowField(f.name, f.dataType, f.nullable))
      .toSeq.asJava)

  private def toArrowField(name: String, dt: DataType,
                           nullable: Boolean): Field = {
    def leaf(t: ArrowType): Field =
      new Field(name, new FieldType(nullable, t, null), null)
    dt match {
      case BooleanType => leaf(ArrowType.Bool.INSTANCE)
      case IntegerType => leaf(new ArrowType.Int(32, true))
      case LongType => leaf(new ArrowType.Int(64, true))
      case FloatType =>
        leaf(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
      case DoubleType =>
        leaf(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
      case StringType => leaf(ArrowType.Utf8.INSTANCE)
      case BinaryType => leaf(ArrowType.Binary.INSTANCE)
      case DateType => leaf(new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY))
      case TimestampType =>
        leaf(new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC"))
      case ArrayType(elem, containsNull) =>
        new Field(name, new FieldType(nullable, ArrowType.List.INSTANCE, null),
          Seq(toArrowField("element", elem, containsNull)).asJava)
      case other =>
        throw new IllegalArgumentException(s"graft-arrow cannot write $other")
    }
  }

  def toSpark(schema: ASchema): StructType =
    StructType(schema.getFields.asScala.map { f =>
      StructField(f.getName, toSparkType(f), f.isNullable)
    }.toSeq)

  private def toSparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Date => DateType
    case t: ArrowType.Timestamp if t.getUnit == ATimeUnit.MICROSECOND =>
      TimestampType
    case _: ArrowType.List =>
      val child = f.getChildren.get(0)
      ArrayType(toSparkType(child), containsNull = child.isNullable)
    case other =>
      throw new IllegalArgumentException(s"graft-arrow cannot read $other")
  }

  // ---- value conversion (read) -----------------------------------------

  private[sources] def vectorValue(v: FieldVector, i: Int, dt: DataType): Any =
    if (v.isNull(i)) null
    else dt match {
      case BooleanType => v.asInstanceOf[BitVector].get(i) == 1
      case IntegerType => v.asInstanceOf[IntVector].get(i)
      case LongType => v.asInstanceOf[BigIntVector].get(i)
      case FloatType => v.asInstanceOf[Float4Vector].get(i)
      case DoubleType => v.asInstanceOf[Float8Vector].get(i)
      case StringType =>
        UTF8String.fromBytes(v.asInstanceOf[VarCharVector].get(i))
      case BinaryType => v.asInstanceOf[VarBinaryVector].get(i)
      case DateType => v.asInstanceOf[DateDayVector].get(i)
      // TimeStampVector covers both the tz-tagged and naive micro vectors
      case TimestampType => v.asInstanceOf[TimeStampVector].get(i)
      case ArrayType(elem, _) =>
        val lv = v.asInstanceOf[ListVector]
        val inner = lv.getDataVector
        val start = lv.getElementStartIndex(i)
        val end = lv.getElementEndIndex(i)
        val out = new Array[Any](end - start)
        var j = start
        while (j < end) {
          out(j - start) = vectorValue(inner, j, elem)
          j += 1
        }
        new GenericArrayData(out)
      case other =>
        throw new IllegalArgumentException(s"graft-arrow cannot read $other")
    }

  // ---- value conversion (write) ----------------------------------------

  /** FieldVector has no common setNull — dispatch on the buffer layout. */
  private def setNullAt(v: FieldVector, i: Int): Unit = v match {
    case f: BaseFixedWidthVector => f.setNull(i)
    case w: BaseVariableWidthVector => w.setNull(i)
    case l: ListVector => l.setNull(i)
    case other => throw new IllegalArgumentException(
      s"graft-arrow cannot null ${other.getClass.getSimpleName}")
  }

  private[sources] def setVector(v: FieldVector, i: Int, dt: DataType,
                                 row: InternalRow, col: Int): Unit =
    if (row.isNullAt(col)) setNullAt(v, i)
    else dt match {
      case BooleanType =>
        v.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(col)) 1 else 0)
      case IntegerType => v.asInstanceOf[IntVector].setSafe(i, row.getInt(col))
      case LongType => v.asInstanceOf[BigIntVector].setSafe(i, row.getLong(col))
      case FloatType =>
        v.asInstanceOf[Float4Vector].setSafe(i, row.getFloat(col))
      case DoubleType =>
        v.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(col))
      case StringType =>
        v.asInstanceOf[VarCharVector].setSafe(i, row.getUTF8String(col).getBytes)
      case BinaryType =>
        v.asInstanceOf[VarBinaryVector].setSafe(i, row.getBinary(col))
      case DateType => v.asInstanceOf[DateDayVector].setSafe(i, row.getInt(col))
      case TimestampType =>
        v.asInstanceOf[TimeStampVector].setSafe(i, row.getLong(col))
      case ArrayType(elem, _) =>
        setListVector(v.asInstanceOf[ListVector], i, elem, row.getArray(col))
      case other =>
        throw new IllegalArgumentException(s"graft-arrow cannot write $other")
    }

  private def setListVector(lv: ListVector, i: Int, elem: DataType,
                            arr: ArrayData): Unit = {
    val n = arr.numElements()
    val start = lv.startNewValue(i)
    val inner = lv.getDataVector
    var j = 0
    while (j < n) {
      val at = start + j
      if (arr.isNullAt(j)) setNullAt(inner, at)
      else elem match {
        case IntegerType =>
          inner.asInstanceOf[IntVector].setSafe(at, arr.getInt(j))
        case LongType =>
          inner.asInstanceOf[BigIntVector].setSafe(at, arr.getLong(j))
        case FloatType =>
          inner.asInstanceOf[Float4Vector].setSafe(at, arr.getFloat(j))
        case DoubleType =>
          inner.asInstanceOf[Float8Vector].setSafe(at, arr.getDouble(j))
        case StringType =>
          inner.asInstanceOf[VarCharVector]
            .setSafe(at, arr.getUTF8String(j).getBytes)
        case other => throw new IllegalArgumentException(
          s"graft-arrow cannot write array<$other>")
      }
      j += 1
    }
    lv.endValue(i, n)
  }
}

private class GraftArrowTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_arrow($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    require(maxSplit > 0, s"maxSplitBytes must be positive, got $maxSplit")
    new GraftArrowScanBuilder(path, tableSchema, maxSplit)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftArrowWriteBuilder(path, info.schema(),
      Option(info.options.get("batchSize")).map(_.toInt).getOrElse(4096))
}

// ---- read --------------------------------------------------------------

private class GraftArrowScanBuilder(path: String, full: StructType,
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
      GraftArrowSource.listArrow(fs, dir).flatMap { p =>
        // footer block index → greedy ≤maxSplitBytes batch ranges, so one
        // giant IPC file fans out and each batch is read exactly once
        val sizes = GraftArrowSource.withReader(fs, p) { r =>
          r.getRecordBlocks.asScala
            .map(b => b.getMetadataLength + b.getBodyLength).toArray
        }
        val splits = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
        var first = 0
        var bytes = 0L
        for (i <- sizes.indices) {
          if (i > first && bytes + sizes(i) > maxSplitBytes) {
            splits += GraftArrowBatchRange(p.toString, first, i - first)
            first = i
            bytes = 0L
          }
          bytes += sizes(i)
        }
        if (first < sizes.length) {
          splits += GraftArrowBatchRange(p.toString, first, sizes.length - first)
        }
        splits
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftArrowReaderFactory(required.json)
  }
}

private case class GraftArrowBatchRange(file: String, firstBatch: Int,
                                        numBatches: Int) extends InputPartition

private class GraftArrowReaderFactory(requiredJson: String)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val split = p.asInstanceOf[GraftArrowBatchRange]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    val fs = new Path(split.file).getFileSystem(new Configuration())
    val alloc = new RootAllocator(Long.MaxValue)
    val in = fs.open(new Path(split.file))
    val len = fs.getFileStatus(new Path(split.file)).getLen
    val reader = new ArrowFileReader(
      new GraftArrowSource.FsSeekableChannel(in, len), alloc)
    val blocks = reader.getRecordBlocks

    new PartitionReader[InternalRow] {
      private var batchIdx = 0          // offset within this split's range
      private var rowIdx = 0
      private var rowsInBatch = 0
      private var vectors: Array[FieldVector] = _

      private def loadNextBatch(): Boolean = {
        if (batchIdx >= split.numBatches) return false
        require(reader.loadRecordBatch(
          blocks.get(split.firstBatch + batchIdx)), "batch load failed")
        val root = reader.getVectorSchemaRoot
        vectors = required.fields.map(f => root.getVector(f.name))
        rowsInBatch = root.getRowCount
        rowIdx = 0
        batchIdx += 1
        true
      }

      override def next(): Boolean = {
        while (rowIdx >= rowsInBatch) {
          if (!loadNextBatch()) return false
        }
        true
      }

      override def get(): InternalRow = {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          row.update(i, GraftArrowSource.vectorValue(
            vectors(i), rowIdx, required(i).dataType))
          i += 1
        }
        rowIdx += 1
        row
      }

      override def close(): Unit = { reader.close(); alloc.close() }
    }
  }
}

// ---- write -------------------------------------------------------------

private class GraftArrowWriteBuilder(path: String, schema: StructType,
                                     batchSize: Int)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftArrowBatchWrite(path, schema, batchSize, doTruncate)
  }
}

private class GraftArrowBatchWrite(path: String, schema: StructType,
                                   batchSize: Int, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (truncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    new GraftArrowWriterFactory(path, schema.json, batchSize)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private case class GraftArrowCommit(file: String) extends WriterCommitMessage

private class GraftArrowWriterFactory(path: String, schemaJson: String,
                                      batchSize: Int)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val sparkSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val arrowSchema = GraftArrowSource.toArrow(sparkSchema)
    val file = new Path(path, f"part-$partitionId%05d-$taskId.arrow")
    val fs = file.getFileSystem(new Configuration())
    val out = fs.create(file, true)
    val alloc = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val writer = new ArrowFileWriter(
      root, null, java.nio.channels.Channels.newChannel(out))
    writer.start()

    new DataWriter[InternalRow] {
      private var n = 0

      private def flush(): Unit = if (n > 0) {
        root.setRowCount(n)
        writer.writeBatch()
        root.getFieldVectors.asScala.foreach(_.reset()) // reuse buffers
        root.setRowCount(0)
        n = 0
      }

      override def write(row: InternalRow): Unit = {
        var i = 0
        while (i < sparkSchema.length) {
          GraftArrowSource.setVector(
            root.getVector(i), n, sparkSchema(i).dataType, row, i)
          i += 1
        }
        n += 1
        if (n >= batchSize) flush()
      }

      override def commit(): WriterCommitMessage = {
        flush()
        writer.end()
        writer.close()
        root.close()
        alloc.close()
        GraftArrowCommit(file.toString)
      }

      override def abort(): Unit = {
        try { writer.close(); root.close(); alloc.close() }
        catch { case _: Throwable => () }
        try fs.delete(file, false) catch { case _: Throwable => () }
      }

      override def close(): Unit = ()
    }
  }
}
