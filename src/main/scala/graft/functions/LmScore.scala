package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language quantized char-bigram LM, the executor-side artifact of
  * [[graft.llm.Curation.perplexityBuckets]]'s fit: sorted primitive-array
  * lookup tables (binary search, zero boxing, zero per-row allocation
  * beyond the text's String view), shipped to tasks inside the [[LmScore]]
  * expression exactly the way CCNet ships its fixed KenLM artifact to
  * workers. Scoring one document is ONE pass over its code points —
  * replaces the explode → 3 broadcast joins → re-aggregate formulation,
  * whose per-bigram row materialization dominated t17's cost.
  *
  * Two key modes, selected by `nBuckets`:
  *  - `nBuckets == 0` (exact): bigram key is (cp₁ << 32 | cp₂), the
  *    alphabet²-sized model of the original fit.
  *  - `nBuckets > 0` (hashed features, the 100 TB default): bigram key is
  *    (cp₁·1024 + cp₂) mod nBuckets and the conditioning key is
  *    cp₁ mod 1024 — the p12/DSIR hashed-feature recipe, which bounds the
  *    model (and the fit's driver hop) at nBuckets entries PER LANGUAGE by
  *    construction, for any alphabet. The map is INJECTIVE whenever
  *    cp₁·1024 + cp₂ < nBuckets and cp₁ < 1024 (with the default
  *    nBuckets = 2¹⁸: all of Latin-1 conditioning × 10-bit second chars —
  *    in particular every ASCII corpus), where hashed scores are
  *    bit-identical to the exact model; beyond it, colliding bigrams merge
  *    counts — the standard, deterministic hashed-feature approximation.
  *
  * Log-probs arrive already quantized to integer micro-nats; the fit does
  * the quantization ONCE (Math.log + BigDecimal HALF_UP — bit-identical to
  * Spark's `round(double, 0)`), so scoring is exact integer arithmetic.
  */
final class LmScorerModel(
    langKeys: Array[UTF8String],
    bgKeys: Array[Array[Long]], // per lang, sorted bigram keys (see key modes)
    bgVals: Array[Array[Long]],
    c1Keys: Array[Array[Int]], // per lang, sorted conditioning keys
    c1Vals: Array[Array[Long]],
    lpg: Array[Long],
    val nBuckets: Int) extends Serializable {

  private def langIndex(lang: UTF8String): Int = {
    var i = 0
    while (i < langKeys.length) {
      if (langKeys(i).equals(lang)) return i
      i += 1
    }
    -1
  }

  /** (nll_micro, n_bigrams) for one doc, or null when the language has no
    * model or the text has no bigrams — the same out-of-scope semantics
    * the join formulation produced via inner-join + length filter.
    */
  def score(lang: UTF8String, text: UTF8String): InternalRow = {
    val li = langIndex(lang)
    if (li < 0) return null
    val s = text.toString
    val bk = bgKeys(li); val bv = bgVals(li)
    val ck = c1Keys(li); val cv = c1Vals(li)
    val g = lpg(li)
    val nB = nBuckets
    var nll = 0L
    var nb = 0L
    var prev = -1
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 0) {
        val key =
          if (nB > 0) (prev.toLong * 1024L + cp.toLong) % nB
          else (prev.toLong << 32) | (cp.toLong & 0xFFFFFFFFL)
        val cKey = if (nB > 0) prev % 1024 else prev
        val bi = java.util.Arrays.binarySearch(bk, key)
        val lp =
          if (bi >= 0) bv(bi)
          else {
            val ci = java.util.Arrays.binarySearch(ck, cKey)
            if (ci >= 0) cv(ci) else g
          }
        nll -= lp
        nb += 1
      }
      prev = cp
      i += Character.charCount(cp)
    }
    if (nb == 0) null
    else new GenericInternalRow(Array[Any](nll, nb))
  }
}

object LmScorerModel {
  /** Quantize ln(x) to integer micro-nats exactly like the engine
    * formulation `round(log(x) * 1e6, 0).cast("long")` (Spark's round on
    * doubles is BigDecimal HALF_UP — same libm log, same rounding rule,
    * same JVM ⇒ bit-identical).
    */
  def microNats(x: Double): Long =
    java.math.BigDecimal.valueOf(math.log(x) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Shared add-V-smoothing assembly: per language, takes the (bigramKey,
    * count) entries plus each key's attributed conditioning key, derives
    * conditioning totals and V, and quantizes the three log-prob tiers.
    */
  private def assemble(
      perLang: Seq[(String, Seq[(Long, Int, Long)])], // (lang, (bgKey, condKey, count))
      nBuckets: Int): LmScorerModel = {
    val sortedLangs = perLang.sortBy(_._1)
    val langKeys = sortedLangs.map { case (l, _) => UTF8String.fromString(l) }.toArray
    val n = sortedLangs.size
    val bgK = new Array[Array[Long]](n); val bgV = new Array[Array[Long]](n)
    val c1K = new Array[Array[Int]](n); val c1V = new Array[Array[Long]](n)
    val lpg = new Array[Long](n)
    sortedLangs.zipWithIndex.foreach { case ((_, rs), i) =>
      val c1Counts = rs.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val v = c1Counts.size
      val c1Map = c1Counts.toMap
      val sortedBg = rs.sortBy(_._1)
      bgK(i) = sortedBg.map(_._1).toArray
      bgV(i) = sortedBg.map { case (_, ck, c) =>
        microNats((c + 1.0) / (c1Map(ck) + v))
      }.toArray
      c1K(i) = c1Counts.map(_._1).toArray
      c1V(i) = c1Counts.map { case (_, cc) => microNats(1.0 / (cc + v)) }.toArray
      lpg(i) = microNats(1.0 / v)
    }
    new LmScorerModel(langKeys, bgK, bgV, c1K, c1V, lpg, nBuckets)
  }

  /** Build the HASHED-key tables from (lang, bucket, count) rows, bucket =
    * (cp₁·1024 + cp₂) mod nBuckets. The conditioning key is attributed
    * from the bucket as (bucket div 1024) mod 1024 — equal to cp₁ wherever
    * the bucket map is injective (see class doc), deterministic everywhere.
    */
  def fromHashedCounts(rows: Seq[(String, Long, Long)],
      nBuckets: Int): LmScorerModel = {
    require(nBuckets > 0 && nBuckets % 1024 == 0,
      s"nBuckets must be a positive multiple of 1024, got $nBuckets")
    assemble(
      rows.groupBy(_._1).toSeq.map { case (l, rs) =>
        (l, rs.map { case (_, bucket, c) =>
          (bucket, ((bucket / 1024L) % 1024L).toInt, c)
        })
      },
      nBuckets)
  }
}

/** Native expression: `lm_score(lang, text)` → struct(nll, nb) — the fused
  * LM scoring pass. Carries the fitted [[LmScorerModel]] as a BROADCAST
  * handle (one executor-wide copy per JVM, resolved once per partition in
  * codegen — not re-serialized into every task closure; no SQL-registry
  * form: the model is a runtime artifact, not a literal), so it goes
  * through ColumnBridge like the other stateful graft expressions.
  */
case class LmScore(lang: Expression, text: Expression,
    model: Broadcast[LmScorerModel])
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = lang
  override def right: Expression = text
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("nll", LongType, nullable = false),
    StructField("nb", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "lm_score"

  @transient private lazy val localModel: LmScorerModel = model.value

  override def nullSafeEval(l: Any, t: Any): Any =
    localModel.score(l.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("lmModelBc", model,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast ONCE per operator instance, not per row
    val modelVar = ctx.addMutableState(classOf[LmScorerModel].getName, "lmModel",
      v => s"$v = (${classOf[LmScorerModel].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (l, t) => s"""
      ${ev.value} = $modelVar.score($l, $t);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LmScore =
    copy(lang = newLeft, text = newRight)
}
