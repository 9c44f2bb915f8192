package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition counters shared by interpreted eval and
  * generated code: ONE pass over the text produces every signal the
  * repetition-based quality filters (the Gopher/C4 rules) consume —
  * word count, distinct-word count, top-word frequency, longest run of
  * consecutive identical words, and duplicate-bigram occurrences.
  *
  * Repetition stats are intrinsically per-row, so the scale-correct shape
  * is a scan-side kernel — the explode→groupBy(doc_id, word)→window
  * formulation shuffles one row PER TOKEN (≈50× the corpus row count)
  * twice, purely to compute numbers each row already contains. Here the
  * whole computation stays inside the scan's codegen stage: no token rows
  * ever leave the operator, nothing shuffles.
  *
  * Token boundaries are exactly `split(text, ' ')` non-empty entries
  * (matching the oracle's `string_split` + filter), bigram identity is
  * the space-joined token pair, and a run's length is counted in words
  * (a non-repeated word is a run of 1).
  */
final class RepetitionCounter extends Serializable {
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val wordCounts = new java.util.HashMap[String, Integer]()
    val bigramCounts = new java.util.HashMap[String, Integer]()
    var wordCnt = 0L
    var top = 0
    var maxRun = 0
    var run = 0
    var prev: String = null
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val w = s.substring(start, i)
          wordCnt += 1
          val c = wordCounts.merge(w, 1, (a: Integer, b: Integer) => a + b)
          if (c > top) top = c
          if (prev != null) {
            run = if (w == prev) run + 1 else 1
            bigramCounts.merge(prev + " " + w, 1, (a: Integer, b: Integer) => a + b)
          } else run = 1
          if (run > maxRun) maxRun = run
          prev = w
        }
        start = i + 1
      }
      i += 1
    }
    var nb = 0L
    var dup = 0L
    val it = bigramCounts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      nb += c
      dup += c - 1
    }
    new GenericInternalRow(Array[Any](
      wordCnt, wordCounts.size.toLong, top.toLong, maxRun.toLong, nb, dup))
  }
}

/** Native expression: `repetition_stats(text)` → struct(word_cnt,
  * distinct_cnt, top_cnt, max_run, bigram_cnt, dup_bigram_cnt) — one
  * fused scan per row. Deterministic, so Spark's common-subexpression
  * elimination evaluates it once per row no matter how many struct
  * fields a projection extracts.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("word_cnt", LongType, nullable = false),
    StructField("distinct_cnt", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false),
    StructField("bigram_cnt", LongType, nullable = false),
    StructField("dup_bigram_cnt", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  @transient private lazy val counter = new RepetitionCounter

  override def nullSafeEval(input: Any): Any =
    counter.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repCounter", counter,
      classOf[RepetitionCounter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RepetitionStats].getName, "repetition_stats")
}
