// gsf2-only: four decimal sums — repeats, WSCG off, task-time metrics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
spark.conf.set("spark.sql.shuffle.partitions", "32")
def t(label: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
}
var taskTime = 0L; var gcTime = 0L
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    taskTime += te.taskMetrics.executorRunTime
    gcTime += te.taskMetrics.jvmGCTime
  }
})
val df = spark.read.parquet("/root/repo/data/gsf2/lineitem.parquet")
  .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
def four() = df.agg(
  sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(30, 6))),
  sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(30, 6))),
  sum((col("l_discount") * col("l_discount")).cast(DecimalType(30, 6))),
  sum((col("l_tax") * col("l_tax")).cast(DecimalType(30, 6)))).collect()
df.count()
t("run1")(four())
println(s"  taskTime=${taskTime/1000.0}s gc=${gcTime/1000.0}s"); taskTime = 0; gcTime = 0
t("run2")(four())
println(s"  taskTime=${taskTime/1000.0}s gc=${gcTime/1000.0}s"); taskTime = 0; gcTime = 0
spark.conf.set("spark.sql.codegen.wholeStage", "false")
t("run3 WSCG off")(four())
println(s"  taskTime=${taskTime/1000.0}s gc=${gcTime/1000.0}s")
System.exit(0)
