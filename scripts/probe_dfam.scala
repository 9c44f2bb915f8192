// Time d04/d16/d07 post scan-spread (3 runs each).
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.util.Tables.preflight(spark, "/root/testdata/sf0.1")
val qs = graft.SparkEntry.queries
for (name <- Seq("d04_ngram_jaccard", "d16_containment", "d07_neardup_components", "d14_keeper_selection");
     run <- 1 to 3) {
  val t0 = System.nanoTime()
  qs(name)(spark, "/root/testdata/sf0.1").queryExecution.toRdd.foreach(_ => ())
  println(f"QTIME $name run$run ${(System.nanoTime - t0) / 1e9}%.2f")
  spark.catalog.clearCache()
  graft.util.Tables.dropGraftTempViews(spark)
  System.gc()
}
System.exit(0)
