// Shape-check the mid-tier batch queries: per-job wall + per-stage tasks/cpu.
import org.apache.spark.scheduler._
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val dur = (for (s <- si.submissionTime; e <- si.completionTime) yield (e - s) / 1e3).getOrElse(-1.0)
    val tm = si.taskMetrics
    if (dur > 0.3)
      println(f"    STAGE ${si.stageId}%4d $dur%6.2fs tasks=${si.numTasks}%3d cpu=${tm.executorCpuTime / 1e9}%6.2fs rows=${tm.inputMetrics.recordsRead + tm.shuffleReadMetrics.recordsRead}%9d")
  }
})
graft.util.Tables.preflight(spark, "/root/testdata/sf0.1")
val qs = graft.SparkEntry.queries
val names = Seq("x14_sliding_window_distinct", "x12_grouped_hll", "x08_grouped_quantiles",
  "t17_lm_perplexity", "t21_domain_perplexity_mix", "a13_corr_matrix", "a02_capping",
  "d04_ngram_jaccard", "d09_long_substring", "d16_containment", "d15_minhash_hightheta",
  "p08_quality_classifier", "x04_salted_join", "mm14_media_dedup_stored_index")
for (name <- names; run <- 1 to 2) {
  val t0 = System.nanoTime()
  qs(name)(spark, "/root/testdata/sf0.1").queryExecution.toRdd.foreach(_ => ())
  println(f"QTIME $name run$run ${(System.nanoTime - t0) / 1e9}%.2f")
  spark.catalog.clearCache()
  graft.util.Tables.dropGraftTempViews(spark)
  System.gc()
}
System.exit(0)
