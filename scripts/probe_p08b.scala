// d11 then p08 in one session, full serialization stack on failure.
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
graft.util.Tables.preflight(spark, "/root/testdata/sf0.01")
val qs = graft.SparkEntry.queries
qs("d11_semantic_dedup")(spark, "/root/testdata/sf0.01").queryExecution.toRdd.foreach(_ => ())
println("D11 OK")
try {
  qs("p08_quality_classifier")(spark, "/root/testdata/sf0.01").
    queryExecution.toRdd.foreach(_ => ())
  println("P08 OK")
} catch {
  case e: Throwable =>
    e.printStackTrace()
    var c = e.getCause
    while (c != null) { println("CAUSE: " + c); c = c.getCause }
}
System.exit(0)
