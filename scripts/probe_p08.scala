// Reproduce p08's Task not serializable with full stack.
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
graft.util.Tables.preflight(spark, "/root/testdata/sf0.01")
try {
  graft.SparkEntry.queries("p08_quality_classifier")(spark, "/root/testdata/sf0.01").
    queryExecution.toRdd.foreach(_ => ())
  println("P08 OK")
} catch {
  case e: Throwable =>
    e.printStackTrace()
    var c = e.getCause
    while (c != null) { println("CAUSE: " + c); c = c.getCause }
}
System.exit(0)
