// Microbench: array_intersect cost per row, string vs long elements, and
// whether its codegen path is used (vs CodegenFallback nullSafeEval).
// Single-line statements only (see -I REPL continuation trap).
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
def timeIt(label: String)(f: => Any): Unit = { val t0 = System.nanoTime(); val r = f; println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r") }
val n = 1000000L
val base = spark.range(0, n, 1, 32)
val strA = base.withColumn("sa", transform(sequence(lit(0), lit(49)), i => concat(lit("gram_"), (col("id") + i * 7) % 4000)))
val strB = strA.withColumn("sb", transform(sequence(lit(0), lit(49)), i => concat(lit("gram_"), (col("id") + i * 11) % 4000))).cache()
timeIt("warm string df")(strB.count())
timeIt("string intersect 1M")(strB.agg(sum(size(array_intersect(col("sa"), col("sb"))))).collect()(0))
timeIt("string intersect 1M run2")(strB.agg(sum(size(array_intersect(col("sa"), col("sb"))))).collect()(0))
val lngA = base.withColumn("sa", transform(sequence(lit(0), lit(49)), i => xxhash64((col("id") + i * 7) % 4000)))
val lngB = lngA.withColumn("sb", transform(sequence(lit(0), lit(49)), i => xxhash64((col("id") + i * 11) % 4000))).cache()
timeIt("warm long df")(lngB.count())
timeIt("long intersect 1M")(lngB.agg(sum(size(array_intersect(col("sa"), col("sb"))))).collect()(0))
timeIt("long intersect 1M run2")(lngB.agg(sum(size(array_intersect(col("sa"), col("sb"))))).collect()(0))
val one = strB.limit(1).select(size(array_intersect(col("sa"), col("sb"))).as("x"))
println("PROBE codegen dump follows")
one.queryExecution.debug.codegen()
System.exit(0)
