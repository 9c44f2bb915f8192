package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word n-gram kernel: split once, emit the m = len − n + 1 sliding
  * grams in one loop. Byte-identical output to the zip_with-over-shifted-
  * slices formulation in [[graft.llm.Dedup.wordNGrams]] (and to the SQL
  * twin `words[i] || ' ' || words[i+1] || …`), without materializing the
  * n shifted slice arrays + intermediate concat arrays per row.
  */
object WordNGramsUtil {
  private val SPACE = UTF8String.fromString(" ")

  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(SPACE, toks.slice(i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression: `word_ngrams(text, n)` → array<string> of sliding
  * word n-grams (whitespace-split, space-joined).
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGramsUtil.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramsUtil.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
