package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused kernel for the deterministic random-hyperplane LSH signature.
  *
  * Hyperplane j, component i has weight
  * frac(sin(i·12.9898 + j·78.233)·43758.5453) − 0.5 — a stateless,
  * reproducible pseudo-random weight (no RNG object, no broadcast state),
  * so every executor computes identical planes.
  */
object HyperplaneSigUtil {
  def weight(i: Int, j: Int): Double = {
    val h = math.sin(i * 12.9898 + j * 78.233) * 43758.5453
    h - math.floor(h) - 0.5
  }

  def signature(v: Array[Float], nBits: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var proj = 0.0
      var i = 0
      while (i < v.length) { proj += v(i) * weight(i, j); i += 1 }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Native expression: `hyperplane_sig(array<float>, nBits)` → long bit
  * signature. Replaces a (nBits × dim)-term Catalyst expression tree (which
  * falls out of whole-stage codegen and evaluates element_at per term) with
  * one fused loop — the candidate-generation kernel for LSH ANN/near-dup at
  * scale.
  */
case class HyperplaneSignature(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any =
    HyperplaneSigUtil.signature(input.asInstanceOf[ArrayData].toFloatArray(), nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSigUtil.signature($c.toFloatArray(), $nBits);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
