package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro container-file source/sink over the Avro core library + Hadoop
  * FS API — this environment ships `avro-1.12.1` but NOT the
  * `spark-avro` connector module, so `format("avro")` is unavailable
  * and the mainstream interchange format gets a purpose-built path
  * (the reference itself has no connectors beyond CSV/Parquet —
  * SURVEY.md §2.1 — so this is breadth, not parity).
  *
  * Execution shape, 100 TB stance:
  *  - WRITE is one Avro container file per partition
  *    (`part-NNNNN.avro`) through `FileSystem.create` — executors write
  *    in parallel to whatever FS the path's scheme resolves (local,
  *    HDFS, S3A); the driver only prepares the directory and stamps
  *    `_SUCCESS`. Deflate-compressed blocks with sync markers, the
  *    standard layout every Avro consumer reads.
  *  - READ parallelizes over the part files (one task per file) and
  *    streams each through `DataFileStream` — no whole-file
  *    materialization. Per-FILE parallelism (not intra-file splitting
  *    on sync markers) is the documented granularity: a 100 TB dataset
  *    written by any distributed engine arrives as many part files, so
  *    file-count parallelism is the natural unit; a single giant .avro
  *    file would under-parallelize and is called out rather than
  *    silently handled.
  *  - Schema is read from ONE file header at plan time (they are
  *    identical by construction); rows decode straight to the
  *    DataFrame's `ExpressionEncoder` serializer per partition.
  *
  * Type surface (documented subset, `require`d at write): boolean, int,
  * long, float, double, string, binary, date (logical date over int),
  * timestamp / timestamp_ntz (logical timestamp-micros /
  * local-timestamp-micros over long), each nullable via
  * `union(null, T)`. Nested structs/arrays/decimals are out of scope
  * for this connector and rejected loudly.
  */
object AvroIO {

  private val SupportedPrimitives: Set[DataType] = Set(BooleanType, IntegerType,
    LongType, FloatType, DoubleType, StringType, BinaryType, DateType,
    TimestampType, TimestampNTZType)

  /** Spark → Avro schema (record named `name`), nullable fields as
    * `union(null, T)`.
    */
  def avroSchema(schema: StructType, name: String = "graft_row"): Schema = {
    val fields = schema.fields.map { f =>
      require(SupportedPrimitives.contains(f.dataType),
        s"AvroIO supports ${SupportedPrimitives.mkString(", ")}; " +
          s"field ${f.name} has ${f.dataType}")
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType => Schema.create(Schema.Type.LONG)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType => LogicalTypes.timestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType => LogicalTypes.localTimestampMicros()
          .addToSchema(Schema.create(Schema.Type.LONG))
        case other => sys.error(s"unreachable: $other")
      }
      val typ = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      // nullable fields declare a null default so schema RESOLUTION can
      // fill them when an older writer schema lacks the field (the Avro
      // evolution contract q41 exercises); non-nullable fields stay
      // default-free — a reader REQUIRING a field an old file lacks is
      // a loud error, which is the correct failure mode
      if (f.nullable)
        new Schema.Field(f.name, typ, null,
          org.apache.avro.JsonProperties.NULL_VALUE)
      else new Schema.Field(f.name, typ, null, null)
    }
    Schema.createRecord(name, null, "graft.sources", false, fields.toList.asJava)
  }

  /** Avro → Spark schema; inverts [[avroSchema]]'s mapping. */
  def sparkSchema(schema: Schema): StructType = {
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union $s")
        (nonNull.head, true)
      } else (s, false)
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      val dt = (t.getType, Option(t.getLogicalType).map(_.getName).orNull) match {
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.INT, "date") => DateType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.LONG, "timestamp-micros") => TimestampType
        case (Schema.Type.LONG, "local-timestamp-micros") => TimestampNTZType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.BYTES, _) => BinaryType
        case (typ, _) => sys.error(s"AvroIO cannot map avro type $typ")
      }
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  /** Write `df` as a directory of Avro container files, one per
    * partition. Always overwrites (the sink contract q04/q05/q36 use).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString
    val dir = new Path(path)
    // session Hadoop conf, scheme-aware on BOTH sides: resolved here for
    // the driver's directory prep, shipped (serializable wrapper) into
    // each write task — `new Configuration()` in a task would drop any
    // session-configured FS impl/credentials (round-13 advice)
    val confSer = new graft.util.SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    val fs = dir.getFileSystem(confSer.value)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val taskSchema = new Schema.Parser().parse(avroJson)
        val out = new Path(path, f"part-$pid%05d.avro")
        val stream = out.getFileSystem(confSer.value).create(out, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](taskSchema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(taskSchema, stream)
        try {
          var written = 0L
          rows.foreach { row =>
            val rec = new GenericData.Record(taskSchema)
            var i = 0
            while (i < row.length) {
              rec.put(i, toAvro(row, i))
              i += 1
            }
            writer.append(rec)
            written += 1
          }
          Iterator.single(written)
        } finally writer.close() // closes the FS stream too
      }
    }.count(): Unit
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  private def toAvro(row: Row, i: Int): AnyRef =
    if (row.isNullAt(i)) null
    else row.get(i) match {
      case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
      case d: java.time.LocalDate => Int.box(d.toEpochDay.toInt)
      case t: java.sql.Timestamp =>
        Long.box(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case t: java.time.Instant =>
        Long.box(t.getEpochSecond * 1000000L + t.getNano / 1000)
      case t: java.time.LocalDateTime => // TimestampNTZ: wall-clock micros
        Long.box(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000)
      case b: Array[Byte] => ByteBuffer.wrap(b)
      case s: String => new Utf8(s)
      case other => other.asInstanceOf[AnyRef]
    }

  /** Read a directory written by [[write]] (or any single-schema set of
    * Avro container files) as a DataFrame. One task per part file.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    readResolved(spark, path, None)

  /** Read a directory whose files may span several WRITER schema
    * generations under one explicit READER schema — Avro's schema
    * resolution (the evolution contract): fields are matched by NAME,
    * so generations may reorder fields freely; a reader field missing
    * from a file's writer schema fills from its default (nullable
    * fields carry `null` — [[avroSchema]]); writer fields absent from
    * the reader are skipped on decode (projection, not an error); and
    * int→long is promoted. A NON-nullable reader field an old
    * generation lacks fails loudly at decode — the correct strictness.
    * Each task resolves its own file's header schema against the
    * reader, so generations interleave freely across part files.
    */
  def read(spark: SparkSession, path: String, reader: StructType): DataFrame =
    readResolved(spark, path, Some(reader))

  private def readResolved(spark: SparkSession, path: String,
      reader: Option[StructType]): DataFrame = {
    val dir = new Path(path)
    val confSer = new graft.util.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val fs = dir.getFileSystem(confSer.value)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val schema = reader.getOrElse {
      val headerStream = new Path(files.head)
        .getFileSystem(confSer.value).open(new Path(files.head))
      val headerReader = new DataFileStream[GenericRecord](headerStream,
        new GenericDatumReader[GenericRecord]())
      try sparkSchema(headerReader.getSchema) finally headerReader.close()
    }
    val readerJson = reader.map(avroSchema(_).toString)
    val fieldTypes = schema.fields.map(_.dataType)
    val rowRdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { p =>
        val in = new Path(p).getFileSystem(confSer.value)
          .open(new Path(p))
        // with an expected (reader) schema, DataFileStream hands the
        // file's own header schema to the datum reader as the WRITER
        // side and Avro's ResolvingDecoder does the rest
        val datumReader = readerJson match {
          case Some(j) => new GenericDatumReader[GenericRecord](
            null, new Schema.Parser().parse(j))
          case None => new GenericDatumReader[GenericRecord]()
        }
        val fileReader = new DataFileStream[GenericRecord](in, datumReader)
        // DataFileStream is an iterator of records; wrap so close()
        // happens when the file drains
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = fileReader.hasNext
            if (!h) fileReader.close()
            h
          }
          def next(): Row = {
            val rec = fileReader.next()
            Row.fromSeq(fieldTypes.indices
              .map(i => fromAvro(rec.get(i), fieldTypes(i))))
          }
        }
      }
    spark.createDataFrame(rowRdd, schema)
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString
      case DateType => java.sql.Date
        .valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining())
        bb.duplicate().get(arr)
        arr
      case _ => v
    }
}
