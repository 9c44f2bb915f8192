// q42 feasibility probe: CSV generations with differing column counts
// under one reader schema. v1 rows have 3 fields, v2 rows 4. What do
// PERMISSIVE / DROPMALFORMED / FAILFAST do on the short v1 rows?
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
val dir = java.nio.file.Files.createTempDirectory("q42probe").toString
java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "gen1.csv"), "1,alpha,10.5\n2,beta,20.25\n")
java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "gen2.csv"), "3,gamma,30.0,SEG_A\n4,delta,40.75,SEG_B\n")
val schema4 = StructType(Seq(StructField("k", LongType), StructField("name", StringType), StructField("bal", DoubleType), StructField("seg", StringType)))
val withCorrupt = StructType(schema4.fields :+ StructField("_corrupt_record", StringType))
val perm = spark.read.schema(withCorrupt).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record").csv(dir).cache()
perm.orderBy("k").show(false)
println("PROBE permissive_rows=" + perm.count() + " corrupt=" + perm.filter(col("_corrupt_record").isNotNull).count())
val dropped = spark.read.schema(schema4).option("mode", "DROPMALFORMED").csv(dir)
println("PROBE drop_rows=" + dropped.rdd.count())
dropped.orderBy("k").show(false)
val threw = try { spark.read.schema(schema4).option("mode", "FAILFAST").csv(dir).rdd.count(); "no" } catch { case _: org.apache.spark.SparkException => "yes" }
println("PROBE failfast_threw=" + threw)
val extraDir = java.nio.file.Files.createTempDirectory("q42probeB").toString
java.nio.file.Files.writeString(java.nio.file.Paths.get(extraDir, "gen1.csv"), "1,alpha,10.5\n")
java.nio.file.Files.writeString(java.nio.file.Paths.get(extraDir, "gen2.csv"), "3,gamma,30.0,SEG_A,EXTRA\n")
val permB = spark.read.schema(StructType(StructType(Seq(StructField("k", LongType), StructField("name", StringType), StructField("bal", DoubleType))).fields :+ StructField("_corrupt_record", StringType))).option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record").csv(extraDir).cache()
permB.show(false)
println("PROBE extra_cols_corrupt=" + permB.filter(col("_corrupt_record").isNotNull).count())
System.exit(0)
