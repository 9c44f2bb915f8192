package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused strip/collapse/trim kernel for the canonical pre-fingerprint text
  * normalization (Curation.normalizeText): keep `[a-z0-9]` (ASCII uppercase
  * folded to lowercase), turn every other character into a separator,
  * collapse separator runs to one space, trim the ends — in ONE pass over
  * the UTF-8 bytes with no regex engine and no intermediate strings.
  *
  * Replaces `trim(regexp_replace(regexp_replace(·, "[^a-z0-9 ]", " "), " +",
  * " "))`, whose two regex passes plus trim dominated p05's per-row cost
  * (the scan-CPU tail of the full-suite scale curve). Byte-level processing
  * is exact for the composition: UTF-8 continuation/lead bytes all have the
  * high bit set, so a multibyte character can never alias a kept ASCII byte
  * — it maps to a separator run that collapses to the same single space the
  * per-codepoint regex would have produced. Unicode LOWERCASING is not this
  * kernel's job: compose as `normalize_ascii(lower(c))` when the input may
  * hold non-ASCII letters whose lowercase form is ASCII (e.g. Kelvin sign).
  */
object NormalizeAsciiUtil {
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var w = 0
    var pendingSep = false
    var i = 0
    while (i < n) {
      var b = s.getByte(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSep && w > 0) { out(w) = ' '; w += 1 }
        pendingSep = false
        out(w) = b
        w += 1
      } else {
        pendingSep = true // spaces, punct, controls, any multibyte sequence
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, w)
  }
}

/** Native expression: `normalize_ascii(string)` → normalized string. */
case class NormalizeAscii(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_ascii"

  override def nullSafeEval(input: Any): Any =
    NormalizeAsciiUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeAsciiUtil.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeAscii =
    copy(child = newChild)
}
