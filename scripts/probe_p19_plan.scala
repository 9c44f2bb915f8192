// measure p19's final adaptive plan shape at sf0.001 (PlanSpec's recipe)
val sf = "/root/testdata/sf0.001"
spark.conf.set("spark.sql.shuffle.partitions", "4")
for (name <- Seq("p19_curate_pack_shard")) {
  spark.catalog.clearCache()
  val df = graft.SparkEntry.queries(name)(spark, sf)
  df.collect()
  val full = df.queryExecution.executedPlan.toString
  val p = full.split("== Initial Plan ==").head
  val ex = "Exchange".r.findAllIn(p).length
  val bc = "BroadcastExchange".r.findAllIn(p).length
  val cg = """\*\((\d+)\)""".r.findAllMatchIn(p).map(_.group(1)).toSet.size
  val widths = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
    .map(_.group(1).count(_ == ':')).toSeq.sorted
  val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
  println(s"PLANSHAPE $name sh=${ex - bc} bc=$bc cg=$cg widths=$widths bnl=$bnl cart=${p.contains("CartesianProduct")}")
}
System.exit(0)
