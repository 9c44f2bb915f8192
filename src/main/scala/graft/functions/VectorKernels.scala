package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused loop kernels for the vector-search hot path (round 18).
  *
  * The previous formulations composed Catalyst higher-order functions —
  * `transform` / `zip_with` / `aggregate` — which are CodegenFallback:
  * every ELEMENT pays an interpreted lambda dispatch with boxed locals,
  * measured at ~1 ms/row on 64-dim embeddings (the dominant cost of the
  * SQ8 family and of probe-to-cell ranking at every corpus size; pure
  * per-row CPU at 100 TB). Each kernel below is the bit-exact same
  * arithmetic as the expression tree it replaces:
  *
  *  - doubles are compared with Spark SQL's ordering (`-0.0 == 0.0`,
  *    via the x == y short-circuit — SQLOrderingUtil.compareDoubles);
  *  - `round(x)` is Spark's RoundBase on DoubleType:
  *    BigDecimal(x).setScale(0, HALF_UP) with NaN/Inf passthrough;
  *  - folds run left-to-right in array order like `aggregate`.
  */
object VectorKernelUtil {
  /** Spark SQL double compare (SQLOrderingUtil): -0.0 == 0.0; NaN biggest. */
  def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Spark's round(double) — RoundBase with scale 0, HALF_UP. */
  def sparkRound0(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else scala.math.BigDecimal(d)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** L2-normalize to doubles; zero-norm vectors pass through unscaled —
    * `transform(emb, x => x / when(nrm > 0, nrm).otherwise(1.0))` with
    * nrm = sqrt(aggregate(emb, 0.0, (acc, x) => acc + x²)).
    */
  def normalize(v: Array[Float]): Array[Double] = {
    var na = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; na += x * x; i += 1 }
    val nrm = math.sqrt(na)
    val d = if (nrm > 0) nrm else 1.0
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i).toDouble / d; i += 1 }
    out
  }

  def normalizeData(v: ArrayData): ArrayData =
    new GenericArrayData(normalize(v.toFloatArray()))

  /** SQ8 codes: round((normalized_i − mins_i) · scales_i) as long. */
  def sq8Codes(v: ArrayData, mins: Array[Double], scales: Array[Double]): ArrayData = {
    val f = v.toFloatArray()
    require(f.length == mins.length,
      s"sq8 codebook dim ${mins.length} != embedding dim ${f.length}")
    val norm = normalize(f)
    val out = new Array[Long](f.length)
    var i = 0
    while (i < f.length) {
      out(i) = sparkRound0((norm(i) - mins(i)) * scales(i)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Symmetric integer code distance: Σ (a_i − b_i)². */
  def sq8Dist(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray(); val y = b.toLongArray()
    require(x.length == y.length, s"code dims differ: ${x.length} vs ${y.length}")
    var acc = 0L
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); acc += d * d; i += 1 }
    acc
  }

  /** Top-`np` nearest centroid ids by (cosine desc, cid asc) — the
    * probeClusters ranking: slice(array_sort(struct(−cos, cid)), 1, np).cid
    * as one bounded selection pass.
    */
  def nearestCells(v0: ArrayData, cents: Array[Array[Float]], np: Int): ArrayData = {
    val v = v0.toFloatArray()
    val n = cents.length
    val k = math.min(np, n)
    val negs = new Array[Double](k)
    val ids = new Array[Int](k)
    var size = 0
    def better(na: Double, ca: Int, nb: Double, cb: Int): Boolean = {
      val c = cmpDouble(na, nb)
      c < 0 || (c == 0 && ca < cb)
    }
    var c = 0
    while (c < n) {
      val neg = -CosineSimUtil.cosine(v, cents(c))
      var pos =
        if (size < k) { size += 1; size - 1 }
        else if (better(neg, c, negs(k - 1), ids(k - 1))) k - 1
        else -1
      if (pos >= 0) {
        while (pos > 0 && better(neg, c, negs(pos - 1), ids(pos - 1))) {
          negs(pos) = negs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        negs(pos) = neg; ids(pos) = c
      }
      c += 1
    }
    val out = new Array[Int](size)
    System.arraycopy(ids, 0, out, 0, size)
    new GenericArrayData(out)
  }

  /** probe2Cells' packed ranking, fused: per codebook the packed key is
    * round((2 − dot)·Q)·4096 + i with dot = cos·‖c_i‖ (0 for a zero-norm
    * codeword); near1 = first np1 of the sorted level-1 keys; the grid key
    * over (a ∈ near1, b ∈ all sorted level-2 keys) is
    * (a»12 + b»12)·2²³ + (a&4095)·4096 + (b&4095); output = first npAll
    * of the sorted grid keys. Integer-exact replication of the
    * transform/flatten/array_sort/slice pipeline.
    */
  def ivf2CellKeys(v0: ArrayData, cents1: Array[Array[Float]],
      norms1: Array[Double], res2: Array[Array[Float]],
      norms2: Array[Double], np1: Int, npAll: Int, q: Double): ArrayData = {
    val v = v0.toFloatArray()
    def packed(cents: Array[Array[Float]], norms: Array[Double]): Array[Long] = {
      val out = new Array[Long](cents.length)
      var i = 0
      while (i < cents.length) {
        val dot =
          if (norms(i) > 0) CosineSimUtil.cosine(v, cents(i)) * norms(i)
          else 0.0d
        out(i) = sparkRound0((2.0d - dot) * q).toLong * 4096L + i
        i += 1
      }
      java.util.Arrays.sort(out)
      out
    }
    val p1 = packed(cents1, norms1)
    val p2 = packed(res2, norms2)
    val n1 = math.min(np1, p1.length)
    val grid = new Array[Long](n1 * p2.length)
    var a = 0
    var w = 0
    while (a < n1) {
      val ka = p1(a)
      var b = 0
      while (b < p2.length) {
        val kb = p2(b)
        grid(w) = ((ka >> 12) + (kb >> 12)) * (1L << 23) +
          (ka & 4095L) * 4096L + (kb & 4095L)
        w += 1; b += 1
      }
      a += 1
    }
    java.util.Arrays.sort(grid)
    val n = math.min(npAll, grid.length)
    val out = new Array[Long](n)
    System.arraycopy(grid, 0, out, 0, n)
    new GenericArrayData(out)
  }
}

/** normalize_emb(array<float>) → array<double>. */
case class NormalizeEmb(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "normalize_emb"
  override def nullSafeEval(input: Any): Any =
    VectorKernelUtil.normalizeData(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernelUtil.normalizeData($c);")
  override protected def withNewChildInternal(newChild: Expression): NormalizeEmb =
    copy(child = newChild)
}

/** sq8_codes_k(array<float>) → array<long> under a fitted codebook. */
case class Sq8CodesK(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sq8_codes_k"
  override def nullSafeEval(input: Any): Any =
    VectorKernelUtil.sq8Codes(input.asInstanceOf[ArrayData], mins, scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernelUtil.sq8Codes($c, $minsRef, $scalesRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Sq8CodesK =
    copy(child = newChild)
}

/** sq8_dist(array<long>, array<long>) → long symmetric code distance. */
case class Sq8Dist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_dist"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelUtil.sq8Dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernelUtil.sq8Dist($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dist =
    copy(left = newLeft, right = newRight)
}

/** nearest_cells(array<float>) → array<int>: ranked top-np centroid ids. */
case class NearestCells(child: Expression, cents: Array[Array[Float]], np: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  override def nullSafeEval(input: Any): Any =
    VectorKernelUtil.nearestCells(input.asInstanceOf[ArrayData], cents, np)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernelUtil.nearestCells($c, $centsRef, $np);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** ivf2_cell_keys(array<float>) → array<long>: ranked packed (c1, c2) keys. */
case class Ivf2CellKeys(child: Expression, cents1: Array[Array[Float]],
    res2: Array[Array[Float]], np1: Int, npAll: Int, q: Double)
    extends UnaryExpression with ExpectsInputTypes {
  private lazy val norms1 = cents1.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
  private lazy val norms2 = res2.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ivf2_cell_keys"
  override def nullSafeEval(input: Any): Any =
    VectorKernelUtil.ivf2CellKeys(input.asInstanceOf[ArrayData],
      cents1, norms1, res2, norms2, np1, npAll, q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c1Ref = ctx.addReferenceObj("cents1", cents1, "float[][]")
    val n1Ref = ctx.addReferenceObj("norms1", norms1, "double[]")
    val r2Ref = ctx.addReferenceObj("res2", res2, "float[][]")
    val n2Ref = ctx.addReferenceObj("norms2", norms2, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernelUtil.ivf2CellKeys($c, " +
        s"$c1Ref, $n1Ref, $r2Ref, $n2Ref, $np1, $npAll, $q);")
  }
  override protected def withNewChildInternal(newChild: Expression): Ivf2CellKeys =
    copy(child = newChild)
}
