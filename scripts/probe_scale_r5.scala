import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val sw = new LongAdder; val sr = new LongAdder
val lst = new SparkListener { override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { sw.add(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); sr.add(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead) } }
spark.sparkContext.addSparkListener(lst)
val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
val docs20 = (0 until 20).map(i => docs0.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text"))).reduce(_ unionByName _)
val nDocs = docs20.count()
val ev0 = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
val ev20 = (0 until 20).map(i => ev0.select((col("event_id") + lit(i.toLong * 10000000L)).as("event_id"), (col("user_id") + lit(i.toLong * 100000L)).as("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"), col("value"))).reduce(_ unionByName _)
val nEv = ev20.count()
def run(name: String, f: => org.apache.spark.sql.DataFrame, denom: Long): Unit = { Thread.sleep(2000); sw.reset(); sr.reset(); val df = f; val n = df.count(); df.queryExecution.toRdd.foreach(_ => ()); Thread.sleep(3000); println(f"PROBE $name rows=$n write=${sw.sum} read=${sr.sum} wpd=${sw.sum.toDouble/denom}%.1f rpd=${sr.sum.toDouble/denom}%.1f") }
run("d08_chunk_dedup_20x", graft.llm.Curation.chunkDedupAudit(docs20, "doc_id", "text", 10), nDocs)
run("p06_packing_20x", { val toks = docs20.select(col("doc_id"), graft.llm.TextAnalysis.wordCount(col("text")).as("tok")); graft.llm.Curation.packSequences(toks, "doc_id", col("tok"), 2048L, 1000L).groupBy("pack_id").agg(count(lit(1)).as("n_docs"), sum("tokens").as("pack_tokens")) }, nDocs)
run("j01_asof_20x", { val p = ev20.filter(col("event_type") === "purchase").select(col("event_id"), col("user_id"), col("ts_us")); val c = ev20.filter(col("event_type") === "click").select(col("user_id"), col("ts_us"), col("value").as("click_value")); graft.joins.TemporalJoins.asofJoin(p, c, "user_id", "ts_us", Seq("click_value")) }, nEv)
println(s"PROBE corpus nDocs=$nDocs nEvents=$nEv textBytes=" + docs20.agg(sum(length(col("text")))).head.getLong(0))
System.exit(0)
