// Microbench topk_sim_distinct: synthetic 1M rows, 2000 ids, 32 partitions.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
graft.functions.GraftFunctions.ensureRegistered(spark)
spark.conf.set("spark.sql.shuffle.partitions", "32")

val df = spark.range(0, 1000000, 1, 32).select(
  (col("id") % 2000).as("id"),
  (col("id") % 97).cast("double").as("sim"),
  (col("id") % 3777).as("nbr")).localCheckpoint()

for (r <- 1 to 3) {
  val t0 = System.nanoTime()
  df.groupBy("id")
    .agg(call_function("topk_sim_distinct", col("sim"), col("nbr"), lit(30)).as("top"))
    .select(col("id"), explode(col("top")).as("e"))
    .queryExecution.toRdd.foreach(_ => ())
  println(f"topk_sim_distinct 1M rows run$r: ${(System.nanoTime - t0) / 1e9}%.2f s")
}
// same but plain topk_sim
for (r <- 1 to 3) {
  val t0 = System.nanoTime()
  df.groupBy("id")
    .agg(call_function("topk_sim", col("sim"), col("nbr"), lit(30)).as("top"))
    .select(col("id"), explode(col("top")).as("e"))
    .queryExecution.toRdd.foreach(_ => ())
  println(f"topk_sim          1M rows run$r: ${(System.nanoTime - t0) / 1e9}%.2f s")
}
// baseline: builtin max_by-ish agg for comparison
for (r <- 1 to 3) {
  val t0 = System.nanoTime()
  df.groupBy("id").agg(slice(array_sort(collect_list(struct(-col("sim"), col("nbr")))), 1, 30).as("top"))
    .select(col("id"), explode(col("top")).as("e"))
    .queryExecution.toRdd.foreach(_ => ())
  println(f"collect_list+sort 1M rows run$r: ${(System.nanoTime - t0) / 1e9}%.2f s")
}
System.exit(0)
