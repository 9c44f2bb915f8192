// Is ~100ms CPU/task a Spark floor or something we add? Trivial stages, measured.
import org.apache.spark.scheduler._
spark.sparkContext.setLogLevel("ERROR")
val acc = new java.util.concurrent.atomic.AtomicLong()
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val tm = si.taskMetrics
    println(f"    STAGE ${si.stageId}%4d tasks=${si.numTasks}%3d cpu=${tm.executorCpuTime / 1e9}%6.3fs deser=${tm.executorDeserializeTime / 1e3}%5.2fs  ${si.name.take(60)}")
  }
})
import org.apache.spark.sql.functions._
// 1. plain range foreach, 32 partitions
for (r <- 1 to 3) spark.range(0, 32, 1, 32).queryExecution.toRdd.foreach(_ => ())
// 2. tiny groupBy (one exchange), 32 shuffle partitions
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "false")
for (r <- 1 to 3) spark.range(0, 1000, 1, 32).groupBy(col("id") % 32).count().queryExecution.toRdd.foreach(_ => ())
System.exit(0)
