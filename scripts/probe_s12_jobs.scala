// Attribute s12's jobs: print each job's callsite + duration + stage task counts.
// Run: /opt/spark/bin/spark-shell --master local[32] --driver-class-path target/scala-2.13/classes -I scripts/probe_s12_jobs.scala
import org.apache.spark.scheduler._

val sfDir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.sparkContext.setLogLevel("ERROR")

val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val cs = Option(js.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")
    jobInfo.put(js.jobId, (js.time, cs))
  }
  override def onJobEnd(je: SparkListenerJobEnd): Unit = {
    val (t0, cs) = jobInfo.getOrDefault(je.jobId, (je.time, "?"))
    val dt = (je.time - t0) / 1e3
    if (dt > 0.05) println(f"  JOB ${je.jobId}%4d $dt%7.2fs  $cs")
  }
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val dur = (for (s <- si.submissionTime; e <- si.completionTime) yield (e - s) / 1e3).getOrElse(-1.0)
    val tm = si.taskMetrics
    if (dur > 0.15)
      println(f"    STAGE ${si.stageId}%4d $dur%7.2fs tasks=${si.numTasks}%3d " +
        f"cpu=${tm.executorCpuTime / 1e9}%6.2fs rows=${tm.inputMetrics.recordsRead + tm.shuffleReadMetrics.recordsRead}%9d  ${si.name}")
  }
})
graft.util.Tables.preflight(spark, sfDir)
val fn = graft.SparkEntry.queries("s12_knn_graph")
for (run <- 1 to 2) {
  val t0 = System.nanoTime()
  fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
  println(f"S12 run$run total=${(System.nanoTime() - t0) / 1e9}%.2f")
  spark.catalog.clearCache()
  graft.util.Tables.dropGraftTempViews(spark)
  System.gc()
}
System.exit(0)
