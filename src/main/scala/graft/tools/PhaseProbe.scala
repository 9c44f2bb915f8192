// Phase probe (round 18): for selected declared queries, split wall time
// into PLAN (analysis+optimization+physical planning) vs EXEC (toRdd run),
// twice each, to locate driver-side overhead. Usage:
//   sbt 'runMain graft.tools.PhaseProbe <sfDir> <cpus> <query...>'
package graft.tools

import org.apache.spark.sql.SparkSession

object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall clock: where do a query's seconds go?
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, js.time)
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, je.time)
        val dt = (je.time - t0) / 1e3
        if (dt > 0.2) println(f"  JOB ${je.jobId}%4d $dt%7.2fs")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (s <- si.submissionTime; e <- si.completionTime)
          yield (e - s) / 1e3).getOrElse(-1.0)
        val tm = si.taskMetrics
        if (dur > 0.2)
          println(f"    STAGE ${si.stageId}%4d $dur%7.2fs tasks=${si.numTasks}%3d " +
            f"run=${tm.executorRunTime / 1e3}%6.2fs cpu=${tm.executorCpuTime / 1e9}%6.2fs " +
            f"deser=${tm.executorDeserializeTime / 1e3}%5.2fs gc=${tm.jvmGCTime / 1e3}%5.2fs " +
            f"rows=${tm.inputMetrics.recordsRead + tm.shuffleReadMetrics.recordsRead}%9d")
      }
    })
    graft.util.Tables.preflight(spark, sfDir)
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        qe.executedPlan // force analysis + optimization + physical planning
        val t1 = System.nanoTime()
        qe.toRdd.foreach(_ => ())
        val t2 = System.nanoTime()
        spark.catalog.clearCache()
        graft.util.Tables.dropGraftTempViews(spark)
        println(f"PHASE $name run$run build+plan=${(t1 - t0) / 1e9}%.2f exec=${(t2 - t1) / 1e9}%.2f")
      }
      System.gc()
    }
    spark.stop()
  }
}
