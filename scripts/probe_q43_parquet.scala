// q43 probe: parquet generations with an added column under mergeSchema.
import org.apache.spark.sql.functions._
val dir = java.nio.file.Files.createTempDirectory("q43probe").toString
Seq((1L, 10.5), (2L, 20.25)).toDF("k", "bal").write.mode("append").parquet(dir)
Seq((3L, 30.0, "SEG_A"), (4L, 40.75, "SEG_B")).toDF("k", "bal", "seg").write.mode("append").parquet(dir)
val merged = spark.read.option("mergeSchema", "true").parquet(dir)
merged.printSchema()
merged.orderBy("k").show(false)
println("PROBE merged_cols=" + merged.columns.length)
val plain = spark.read.parquet(dir)
println("PROBE plain_cols=" + plain.columns.length + " cols=" + plain.columns.mkString(","))
System.exit(0)
