// Round-6 shuffle-volume probe: j04 interval-overlap join and s04 LSH
// duplicate retrieval at 20x the sf0.1 inputs. Run with:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --driver-memory 24g -I scripts/probe_scale_r6.scala
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
val sw = new LongAdder; val sr = new LongAdder
val lst = new SparkListener { override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { sw.add(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); sr.add(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead) } }
spark.sparkContext.addSparkListener(lst)
def run(name: String, f: => org.apache.spark.sql.DataFrame, denom: Long): Unit = { Thread.sleep(2000); sw.reset(); sr.reset(); val df = f; val n = df.count(); df.queryExecution.toRdd.foreach(_ => ()); Thread.sleep(3000); println(f"PROBE $name rows=$n write=${sw.sum} read=${sr.sum} wpd=${sw.sum.toDouble/denom}%.1f rpd=${sr.sum.toDouble/denom}%.1f") }

// j04 at 20x: 300k per-customer intervals x 60 bands
val ord0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select("o_custkey", "o_totalprice")
val ord20 = (0 until 20).map(i => ord0.select((col("o_custkey") + lit(i.toLong * 10000000L)).as("o_custkey"), col("o_totalprice"))).reduce(_ unionByName _)
val cust = ord20.groupBy("o_custkey").agg(min("o_totalprice").as("lo1"), (max("o_totalprice") + lit(1.0d)).as("hi1"))
val nCust = cust.count()
val bands = spark.range(0, 60).select(col("id").cast("int").as("band_id"), (col("id") * 9000.0d).as("lo2"), (col("id") * 9000.0d + 15000.0d).as("hi2"))
run("j04_overlap_20x", graft.joins.TemporalJoins.intervalOverlapJoin(cust, "lo1", "hi1", bands, "lo2", "hi2", 6000.0, 64, 8).groupBy("band_id").agg(count(lit(1)).as("n_cust")), nCust)

// s04 at 20x: 40k-vector corpus (64-dim), 4k planted scaled-copy probes
val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select("vec_id", "embedding")
val emb20 = (0 until 20).map(i => emb0.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"), col("embedding"))).reduce(_ unionByName _)
val nEmb = emb20.count()
val probes = emb20.filter(col("vec_id") % 10 === 5).select((col("vec_id") + lit(300000000L)).as("vec_id"), transform(col("embedding"), x => (x * lit(1.5f)).cast("float")).as("embedding"))
run("s04_lsh_retrieval_20x", graft.llm.Similarity.lshTopK(spark, emb20, probes, "vec_id", "embedding", 1), nEmb)
println(s"PROBE inputs nCust=$nCust nEmb=$nEmb")
System.exit(0)
