package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub: histogram is L1-normalized and deterministic") {
    val f = Multimodal.decodeStub("aaab".getBytes("UTF-8"))
    f.sum shouldBe 1.0 +- 1e-9
    f(6) shouldBe 1.0 +- 1e-9 // 'a'=0x61,'b'=0x62 → nibble 6
    Multimodal.decodeStub("aaab".getBytes("UTF-8")) shouldBe f
  }

  test("asMedia builds binary content with typed metadata") {
    val media = Multimodal.asMedia(Seq((1L, "hello")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    media.head.meta.byteLen shouldBe 5
    media.head.meta.mime shouldBe "text/plain"
    new String(media.head.content, "UTF-8") shouldBe "hello"
  }

  test("extractFeatures is a narrow per-partition pass (no shuffle)") {
    val docs = (1 to 200).map(i => (i.toLong, s"document number $i")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs, "doc_id", "text"))
    feats.count() shouldBe 200
    // plan must not contain an exchange — the decode path is shuffle-free
    feats.queryExecution.executedPlan.toString should not include "Exchange"
    val f1 = feats.filter(col("doc_id") === 1).head()
    f1.features.sum shouldBe 1.0 +- 1e-9
  }
}
