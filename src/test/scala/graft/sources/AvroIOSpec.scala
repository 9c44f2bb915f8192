package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.{Date, Timestamp}

class AvroIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("flag", BooleanType),
    StructField("small", IntegerType),
    StructField("ratio_f", FloatType),
    StructField("ratio_d", DoubleType),
    StructField("name", StringType),
    StructField("blob", BinaryType),
    StructField("day", DateType),
    StructField("at", TimestampType),
    StructField("at_ntz", TimestampNTZType)))

  private def ts(s: String, nanos: Int): Timestamp = {
    val t = Timestamp.valueOf(s)
    t.setNanos(nanos)
    t
  }

  private val rows = Seq(
    Row(1L, true, 7, 1.5f, 2.25, "alpha", Array[Byte](1, 2, 3),
      Date.valueOf("2024-02-29"), ts("2024-02-29 12:34:56", 789000),
      java.time.LocalDateTime.of(2024, 2, 29, 12, 34, 56, 789000)),
    Row(2L, false, -1, -0.5f, 1e300, "béta ✓", Array[Byte](),
      Date.valueOf("1969-12-31"), ts("1969-12-31 23:59:59", 999999000),
      java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000)),
    Row(3L, null, null, null, null, null, null, null, null, null))

  test("round-trips every supported type, nulls included, to the microsecond") {
    val dir = tmpDir("avro_types")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    back.schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe
      schema.fields.map(f => (f.name, f.dataType)).toSeq
    val got = back.collect().sortBy(_.getLong(0))
    got should have length 3
    got(0).toSeq.zip(rows.head.toSeq).foreach {
      case (a: Array[Byte], b: Array[Byte]) => a.toSeq shouldBe b.toSeq
      case (a, b) => a shouldBe b
    }
    got(1).getAs[Timestamp]("at") shouldBe ts("1969-12-31 23:59:59", 999999000)
    got(1).getAs[java.time.LocalDateTime]("at_ntz") shouldBe
      java.time.LocalDateTime.of(1969, 12, 31, 23, 59, 59, 999999000)
    (1 until schema.size).foreach(i => assert(got(2).isNullAt(i)))
  }

  test("writes one container file per partition plus _SUCCESS, overwrites") {
    val dir = tmpDir("avro_parts")
    val df = spark.range(0, 100, 1, 4).toDF("id")
    AvroIO.write(df, dir)
    AvroIO.write(df, dir) // second write must not accumulate files
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    files.count(_.endsWith(".avro")) shouldBe 4
    files should contain("_SUCCESS")
    val back = AvroIO.read(spark, dir)
    back.rdd.getNumPartitions shouldBe 4 // one task per part file
    back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) shouldBe 4950L
  }

  test("rejects unsupported types loudly") {
    val df = spark.range(3).selectExpr("array(id) AS a")
    val e = intercept[IllegalArgumentException](
      AvroIO.write(df, tmpDir("avro_bad")))
    e.getMessage should include("AvroIO supports")
  }

  test("files are standard Avro container files (magic bytes + codec)") {
    val dir = tmpDir("avro_magic")
    AvroIO.write(spark.range(5).toDF("id"), dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(4)
    head shouldBe Array[Byte]('O', 'b', 'j', 1)
  }

  test("schema evolution: a reader schema null-fills added nullable " +
      "fields, promotes int→long, reorders by name, and projects away " +
      "dropped fields across mixed-generation part files") {
    val dir = tmpDir("avro_evolve")
    import org.apache.spark.sql.functions.col
    // v1 generation: (id long, bucket int, name string)
    val v1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10, "one"), Row(2L, 20, "two")), 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("bucket", IntegerType),
        StructField("name", StringType))))
    // v2 generation: bucket widened to long, extra double, REORDERED
    val v2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("three", 3L, 1.5, 30L), Row("four", 4L, null, 40L)), 1),
      StructType(Seq(StructField("name", StringType),
        StructField("id", LongType, nullable = false),
        StructField("price", DoubleType),
        StructField("bucket", LongType))))
    AvroIO.write(v1, dir)
    val v2dir = tmpDir("avro_evolve_v2")
    AvroIO.write(v2, v2dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.listStatus(new org.apache.hadoop.fs.Path(v2dir))
      .filter(_.getPath.getName.endsWith(".avro"))
      .foreach(st => fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(root, "gen2-" + st.getPath.getName)): Unit)
    // reader: drops `name` (projection), keeps widened bucket + added price
    val reader = StructType(Seq(
      StructField("id", LongType),
      StructField("bucket", LongType),
      StructField("price", DoubleType)))
    val got = AvroIO.read(spark, dir, reader)
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    got shouldBe Seq(
      Seq(1L, 10L, null), Seq(2L, 20L, null),
      Seq(3L, 30L, 1.5), Seq(4L, 40L, null))
  }

  test("schema evolution fails loudly when the reader REQUIRES a field " +
      "an old generation lacks (non-nullable, no default)") {
    val dir = tmpDir("avro_evolve_strict")
    val v1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L)), 1),
      StructType(Seq(StructField("id", LongType, nullable = false))))
    AvroIO.write(v1, dir)
    val reader = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("must_have", LongType, nullable = false)))
    an[Exception] should be thrownBy
      AvroIO.read(spark, dir, reader).collect()
  }
}
