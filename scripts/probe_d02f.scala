// Time the COMPILED Dedup.minhashPairs end-to-end at gsf1/gsf2 (exactly
// what Bench runs), with result counts. Single-statement lines only — the
// -I REPL silently breaks leading-dot continuation chains after a closing
// paren (see probe_d02e postmortem).
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.shuffle.partitions", "32")
def timeIt(label: String)(f: => Long): Unit = {
  val t0 = System.nanoTime()
  val n = f
  println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s n=$n")
}
val docs1 = spark.read.parquet("/root/repo/data/gsf1/documents.parquet")
val docs2 = spark.read.parquet("/root/repo/data/gsf2/documents.parquet")
timeIt("gsf1 minhashPairs run1")(graft.llm.Dedup.minhashPairs(docs1, "doc_id", "text", 0.5).count())
timeIt("gsf1 minhashPairs run2")(graft.llm.Dedup.minhashPairs(docs1, "doc_id", "text", 0.5).count())
timeIt("gsf2 minhashPairs run1")(graft.llm.Dedup.minhashPairs(docs2, "doc_id", "text", 0.5).count())
timeIt("gsf2 minhashPairs run2")(graft.llm.Dedup.minhashPairs(docs2, "doc_id", "text", 0.5).count())
System.exit(0)
