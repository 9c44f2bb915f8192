// Before/after plans + timings for the x02/x12/x14 dedup-then-aggregate
// restructure. "Before" rebuilds the former split-plan formulations
// verbatim; "after" is the shipped declared query.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.shuffle.partitions", "32")
graft.util.Tables.preflight(spark, "/root/testdata/sf0.1")
val d = "/root/testdata/sf0.1"

def dump(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
  df.queryExecution.toRdd.foreach(_ => ()) // final AQE plan
  val txt = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  java.nio.file.Files.write(java.nio.file.Paths.get(path), txt.getBytes("UTF-8"))
  println(s"WROTE $path")
}
def time(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
  for (r <- 1 to 3) {
    val t0 = System.nanoTime()
    mk().queryExecution.toRdd.foreach(_ => ())
    println(f"QTIME $tag run$r ${(System.nanoTime - t0) / 1e9}%.2f")
  }
}

val orders = graft.util.Tables.orders(spark, d)
val events = graft.util.Tables.events(spark, d)

// ---- old formulations, verbatim ----
def oldX02() = {
  val exact = orders.agg(countDistinct(col("o_custkey")).as("exact_distinct"))
  val approx = orders.agg(
    approx_count_distinct(col("o_custkey"), 0.01).as("approx_distinct"))
  exact.crossJoin(approx).
    select(col("exact_distinct"),
      (abs(col("approx_distinct") - col("exact_distinct")) <=
        lit(0.05) * col("exact_distinct")).as("hll_within_5pct"))
}
def oldX12() = {
  val exact = orders.groupBy("o_orderpriority").
    agg(countDistinct(col("o_custkey")).as("exact_distinct"))
  val approx = orders.groupBy("o_orderpriority").
    agg(approx_count_distinct(col("o_custkey"), 0.01).as("ad"))
  exact.join(approx, "o_orderpriority").
    select(col("o_orderpriority"), col("exact_distinct"),
      (abs(col("ad") - col("exact_distinct")) <=
        lit(0.05) * col("exact_distinct")).as("hll_within_5pct")).
    orderBy("o_orderpriority")
}
def oldX14() = {
  val x = events.
    select(col("user_id"), expr("(ts div 1000) div 3600000000").as("h")).
    select(col("user_id"), explode(sequence(col("h") - 2, col("h"))).as("win_h"))
  val exact = x.groupBy("win_h").
    agg(countDistinct(col("user_id")).as("exact_distinct"))
  val approx = x.groupBy("win_h").
    agg(approx_count_distinct(col("user_id"), 0.01).as("ad"))
  exact.join(approx, "win_h").
    select(col("win_h"), col("exact_distinct"),
      (abs(col("ad") - col("exact_distinct")) <=
        lit(0.05) * col("exact_distinct")).as("hll_within_5pct")).
    orderBy("win_h")
}
val qs = graft.SparkEntry.queries
def newQ(name: String) = () => qs(name)(spark, d)

dump(oldX02(), "plans/r18/x02_approx_distinct_before.txt")
dump(newQ("x02_approx_distinct")(), "plans/r18/x02_approx_distinct_after.txt")
dump(oldX12(), "plans/r18/x12_grouped_hll_before.txt")
dump(newQ("x12_grouped_hll")(), "plans/r18/x12_grouped_hll_after.txt")
dump(oldX14(), "plans/r18/x14_sliding_window_distinct_before.txt")
dump(newQ("x14_sliding_window_distinct")(), "plans/r18/x14_sliding_window_distinct_after.txt")

// results identical old vs new (collect + compare, all three)
def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean =
  a.collect().map(_.toSeq).sortBy(_.toString) sameElements b.collect().map(_.toSeq).sortBy(_.toString)
println("IDENTICAL x02=" + same(oldX02(), newQ("x02_approx_distinct")()) +
  " x12=" + same(oldX12(), newQ("x12_grouped_hll")()) +
  " x14=" + same(oldX14(), newQ("x14_sliding_window_distinct")()))

time("x02_old", oldX02 _); time("x02_new", newQ("x02_approx_distinct"))
time("x12_old", oldX12 _); time("x12_new", newQ("x12_grouped_hll"))
time("x14_old", oldX14 _); time("x14_new", newQ("x14_sliding_window_distinct"))
System.exit(0)
