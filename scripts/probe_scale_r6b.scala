// Round-6b shuffle-volume probe: x10 bloom pruning (vs the plain join,
// broadcast disabled so the fact side genuinely shuffles), t12 TF-IDF,
// w08 running distinct, p09 domain mix at 20x the sf0.1 inputs. Run with:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --driver-memory 24g -I scripts/probe_scale_r6b.scala
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
val sw = new LongAdder; val sr = new LongAdder
val lst = new SparkListener { override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { sw.add(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); sr.add(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead) } }
spark.sparkContext.addSparkListener(lst)
def run(name: String, f: => org.apache.spark.sql.DataFrame, denom: Long): Unit = { Thread.sleep(2000); sw.reset(); sr.reset(); val df = f; val n = df.count(); df.queryExecution.toRdd.foreach(_ => ()); Thread.sleep(3000); println(f"PROBE $name rows=$n write=${sw.sum} read=${sr.sum} wpd=${sw.sum.toDouble/denom}%.1f rpd=${sr.sum.toDouble/denom}%.1f") }

// x10 at 20x with broadcast disabled: 12M lineitem rows vs 20x urgent orders.
// Compare fact-side shuffle bytes with and without the bloom pre-filter.
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
val li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select("l_orderkey", "l_extendedprice")
val li20 = (0 until 20).map(i => li0.select((col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"), col("l_extendedprice"))).reduce(_ unionByName _)
val nLi = li20.count()
val ord0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
val urgent20 = (0 until 20).map(i => ord0.select((col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"))).reduce(_ unionByName _)
def joined(fact: org.apache.spark.sql.DataFrame) = fact.join(urgent20, col("l_orderkey") === col("o_orderkey")).agg(count(lit(1)).as("cnt"), sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18,2))).cast("double").as("sum_price"))
run("x10_plain_join_20x", joined(li20), nLi)
val nKeys = math.max(urgent20.count(), 1L)
val bloom = urgent20.stat.bloomFilter("o_orderkey", nKeys, 0.01)
val bloomBc = spark.sparkContext.broadcast(bloom)
val mightContain = udf((k: Long) => bloomBc.value.mightContainLong(k))
run("x10_bloom_join_20x", joined(li20.filter(mightContain(col("l_orderkey")))), nLi)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 100L * 1024 * 1024)

// t12 at 20x: 100k docs
val doc0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
val doc20 = (0 until 20).map(i => doc0.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text"))).reduce(_ unionByName _)
val nDoc = doc20.count()
val terms = doc20.select(col("doc_id"), explode(filter(split(lower(col("text")), " "), t => t =!= "")).as("term"))
val tfq = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
val dfq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
val nD = doc20.agg(count(lit(1)).as("n"))
val wspec = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy(col("tf").desc, col("df").asc, col("term"))
run("t12_tfidf_20x", tfq.join(dfq, "term").withColumn("rank", row_number().over(wspec).cast("long")).filter(col("rank") <= 5).crossJoin(broadcast(nD)).select(col("doc_id"), col("term"), round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 6).as("tfidf")), nDoc)

// w08 at 20x: 2M events, two window passes
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val ev0 = spark.read.parquet("/root/testdata/sf0.1/events.parquet").select("user_id", "event_id", "event_type", "ts")
val ev20 = (0 until 20).map(i => ev0.select((col("user_id") + lit(i.toLong * 1000000L)).as("user_id"), (col("event_id") + lit(i.toLong * 100000000L)).as("event_id"), col("event_type"), col("ts"))).reduce(_ unionByName _)
val nEv = ev20.count()
val firstW = org.apache.spark.sql.expressions.Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
val cumW = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("ts"), col("event_id")).rowsBetween(Long.MinValue, 0)
run("w08_running_distinct_20x", ev20.withColumn("f", when(row_number().over(firstW) === 1, 1).otherwise(0)).select(col("user_id"), col("event_id"), sum(col("f")).over(cumW).cast("long").as("d")), nEv)

// p09 at 20x: 100k docs, map-side sampler + 20-group agg
val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "source")
val docs20 = (0 until 20).map(i => docs0.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("source"))).reduce(_ unionByName _)
val uu = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) / lit(4294967296.0d)
run("p09_domain_mix_20x", docs20.select(col("doc_id"), col("source"), substring(col("source"), 4, 10).cast("int").as("sn")).withColumn("rate", when(col("sn") % 4 === 0, 1.0d).when(col("sn") % 4 === 1, 0.5d).when(col("sn") % 4 === 2, 0.25d).otherwise(0.1d)).withColumn("kept", (uu < col("rate")).cast("int")).groupBy("source").agg(count(lit(1)).as("total"), sum("kept").as("kept")), nDoc)
println(s"PROBE inputs nLi=$nLi nDoc=$nDoc nEv=$nEv")
System.exit(0)
