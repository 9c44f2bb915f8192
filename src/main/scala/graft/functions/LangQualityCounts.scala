package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-set matcher shared by interpreted eval and generated code: ONE
  * pass over the text bytes produces every per-token count the text
  * pipeline needs (word count, non-space char count, and one membership
  * count per marker set).
  *
  * This replaces the higher-order-function formulation
  * `size(filter(split(text, ' '), t => t.isin(...)))` × 7 — HOF lambdas
  * get neither codegen nor common-subexpression elimination, so the full-
  * corpus scoring path (t06/t07/p01) paid 7 interpreted passes plus 7
  * intermediate token arrays per row. Here tokenization happens once, in
  * place, on the UTF-8 bytes (no token array is ever materialized), and
  * marker membership is a handful of length-gated byte compares per token.
  *
  * Bit-identical to the HOF semantics: `split(text, ' ')` boundaries are
  * exactly the single-space bytes (0x20 never occurs inside a multi-byte
  * UTF-8 sequence), a token is counted iff non-empty, and char_cnt equals
  * `length(regexp_replace(text, " ", ""))` = numChars − spaces.
  */
final class TokenSetMatcher(sets: Array[Array[String]]) extends Serializable {
  private val setBytes: Array[Array[Array[Byte]]] =
    sets.map(_.map(_.getBytes("UTF-8")))

  def counts(text: UTF8String): InternalRow = {
    val nSets = setBytes.length
    val out = new Array[Any](2 + nSets)
    var wordCnt = 0L
    var spaceCnt = 0
    val perSet = new Array[Long](nSets)
    val nb = text.numBytes()
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || text.getByte(i) == 0x20) {
        val len = i - start
        if (len > 0) {
          wordCnt += 1
          var k = 0
          while (k < nSets) {
            val ms = setBytes(k)
            var m = 0
            var matched = false
            while (!matched && m < ms.length) {
              val mb = ms(m)
              if (mb.length == len) {
                var j = 0
                var eq = true
                while (eq && j < len) {
                  if (text.getByte(start + j) != mb(j)) eq = false
                  j += 1
                }
                matched = eq
              }
              m += 1
            }
            if (matched) perSet(k) += 1
            k += 1
          }
        }
        if (i < nb) spaceCnt += 1
        start = i + 1
      }
      i += 1
    }
    out(0) = wordCnt
    out(1) = (text.numChars() - spaceCnt).toLong
    var k = 0
    while (k < nSets) { out(2 + k) = perSet(k); k += 1 }
    new GenericInternalRow(out)
  }
}

object LangQualityUtil {
  /** Canonical language marker sets (TextAnalysis.langMarkers delegates
    * here so the kernel and the HOF reference share one definition). */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast"),
    "es" -> Seq("data", "row", "query"),
    "de" -> Seq("table", "scan", "group"),
    "fr" -> Seq("value", "join", "sort"),
    "zh" -> Seq("window", "batch", "stream"))

  val defaultStopwords: Seq[String] = Seq("the", "a")
}

/** Native expression: `lang_quality_counts(text[, stopwords])` →
  * struct(word_cnt, char_cnt, stop_cnt, s_en, s_es, s_de, s_fr, s_zh)
  * — every count the language-ID + quality-scoring pipeline consumes,
  * from one fused scan of the text. Deterministic, so Spark's
  * subexpression elimination evaluates it once per row no matter how many
  * struct fields a projection pulls out.
  */
case class LangQualityCounts(child: Expression,
    stopwords: Seq[String] = LangQualityUtil.defaultStopwords,
    markers: Seq[(String, Seq[String])] = LangQualityUtil.defaultMarkers)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(
    Seq(StructField("word_cnt", LongType, nullable = false),
      StructField("char_cnt", LongType, nullable = false),
      StructField("stop_cnt", LongType, nullable = false)) ++
      markers.map { case (l, _) => StructField(s"s_$l", LongType, nullable = false) })

  override def prettyName: String = "lang_quality_counts"

  @transient private lazy val matcher =
    new TokenSetMatcher((stopwords +: markers.map(_._2)).map(_.toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    matcher.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lqMatcher", matcher,
      classOf[TokenSetMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangQualityCounts =
    copy(child = newChild)
}
