package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic greedy-merge (BPE-style) tokenizer kernel over a fixture
  * merge table. Standard byte-pair-encoding application: a word starts as
  * its character sequence; while any adjacent token pair appears in the
  * merge table, the LOWEST-RANK pair is merged at every non-overlapping
  * occurrence left-to-right; repeat to fixpoint. Deterministic — no
  * learned state, the merge list IS the tokenizer (the GPT-2 `bpe()`
  * application algorithm, rank = merge-list index).
  *
  * One pass per row, no token-array column ever materialized; returns
  * every count token-budget accounting needs: BPE token count, summed
  * token characters (== non-space chars, the conservation law the oracle
  * pins), and whitespace word count (the t03 cross-check).
  */
final class BpeCounter(merges: Array[String]) extends Serializable {
  // rank lookup keyed "left right"; first occurrence wins like real BPE
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < merges.length) {
      m.putIfAbsent(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  def counts(text: UTF8String): InternalRow = {
    val s = text.toString
    var nTokens = 0L
    var nChars = 0L
    var nWords = 0L
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          nWords += 1
          nChars += (i - start)
          nTokens += tokenizeWord(s, start, i)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, nChars, nWords))
  }

  /** Number of BPE tokens for s[from, until). */
  private def tokenizeWord(s: String, from: Int, until: Int): Int = {
    var toks = new scala.collection.mutable.ArrayBuffer[String](until - from)
    var i = from
    while (i < until) { toks += s.substring(i, i + 1); i += 1 }
    var merging = toks.length > 1
    while (merging) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.get(toks(j) + " " + toks(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = j
        }
        j += 1
      }
      if (bestIdx < 0) merging = false
      else {
        val bl = toks(bestIdx)
        val br = toks(bestIdx + 1)
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var p = 0
        while (p < toks.length) {
          if (p < toks.length - 1 && toks(p) == bl && toks(p + 1) == br) {
            out += bl + br; p += 2
          } else { out += toks(p); p += 1 }
        }
        toks = out
        merging = toks.length > 1
      }
    }
    toks.length
  }
}

/** bpe_counts(text, merges) → struct(bpe_tokens, token_chars, ws_words):
  * greedy-merge tokenization counts from one fused scan of the text.
  * `merges` must be a foldable array<string> literal of "left right"
  * entries, rank = position.
  */
case class BpeCounts(child: Expression, merges: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("token_chars", LongType, nullable = false),
    StructField("ws_words", LongType, nullable = false)))

  override def prettyName: String = "bpe_counts"

  @transient private lazy val counter = new BpeCounter(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    counter.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCounter", counter, classOf[BpeCounter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCounts =
    copy(child = newChild)
}
