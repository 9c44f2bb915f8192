// Run s12 repeatedly so jstack can sample the hot stages.
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.util.Tables.preflight(spark, "/root/testdata/sf0.1")
val fn = graft.SparkEntry.queries("s12_knn_graph")
for (run <- 1 to 12) {
  val t0 = System.nanoTime()
  fn(spark, "/root/testdata/sf0.1").queryExecution.toRdd.foreach(_ => ())
  println(f"S12 run$run total=${(System.nanoTime() - t0) / 1e9}%.2f")
  spark.catalog.clearCache()
  graft.util.Tables.dropGraftTempViews(spark)
}
System.exit(0)
