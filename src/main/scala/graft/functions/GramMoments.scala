package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact-decimal Gram-matrix accumulator for the sentinel-augmented
  * embedding vector (m16's covariance pass).
  *
  * Per input row of `d` floats the update adds every upper-triangle
  * product of the augmented vector `(v0..v(d-1), 1.0)` — cross moments,
  * squares, first moments (vi·1) and the row count (1·1) — into a flat
  * (d+1)(d+2)/2-cell buffer. That is the SAME decimal math as the previous
  * `posexplode×2 → sum(cast(v as DECIMAL(30,8)))` plan (each product is
  * rounded to 8 dp exactly the way Spark's double→decimal cast does:
  * shortest-repr `BigDecimal.valueOf` then HALF_UP), with the 2,080×
  * Generate row fanout deleted: state is O(d²) per partition, rows never
  * leave the scan shape, and only the merged buffer crosses the exchange.
  *
  * Exactness across any row count: each cell accumulates the unscaled
  * 8-dp long with `Math.addExact`; on (astronomically rare) overflow the
  * running long spills into a per-cell BigInteger, so the sum stays exact
  * at any corpus size instead of silently wrapping at ~2^63.
  */
final class GramBuffer {
  var aug: Int = -1                       // augmented dim (d + 1); -1 = empty
  var longs: Array[Long] = null           // unscaled 8-dp running sums
  var bigs: Array[BigInteger] = null      // overflow spill, null cells = 0

  def cells: Int = aug * (aug + 1) / 2

  def init(augDim: Int): Unit = {
    aug = augDim
    longs = new Array[Long](cells)
    bigs = new Array[BigInteger](cells)
  }

  def add(c: Int, unscaled: Long): Unit =
    try longs(c) = Math.addExact(longs(c), unscaled)
    catch {
      case _: ArithmeticException =>
        val prev = if (bigs(c) == null) BigInteger.ZERO else bigs(c)
        bigs(c) = prev.add(BigInteger.valueOf(longs(c)))
        longs(c) = unscaled
    }

  /** A single addend too wide for the long fast path goes straight into
    * the BigInteger spill (the running long is untouched).
    */
  def addBig(c: Int, unscaled: BigInteger): Unit = {
    val prev = if (bigs(c) == null) BigInteger.ZERO else bigs(c)
    bigs(c) = prev.add(unscaled)
  }

  def total(c: Int): BigInteger = {
    val l = BigInteger.valueOf(longs(c))
    if (bigs(c) == null) l else bigs(c).add(l)
  }
}

/** gram_moments(embedding) — global/grouped aggregate returning the
  * flattened upper triangle (row-major, 0-based `(i,j)` with `j >= i`
  * over the augmented vector) of exact-decimal moment sums, each finally
  * cast to double (the old plan's `sum(decimal).cast("double")`).
  */
case class GramMoments(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gram_moments"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  /** Accumulate one product into cell `c` under Spark's
    * double→DecimalType(_,8) cast semantics: shortest decimal
    * representation, then HALF_UP. Two edge paths mirror / strengthen the
    * replaced `sum(cast(v AS DECIMAL(30,8)))` plan:
    *  - NaN/Infinity: the decimal cast yields NULL and `sum` skips it —
    *    skip the addend (BigDecimal.valueOf would throw
    *    NumberFormatException and abort the whole job).
    *  - |product| beyond the long fast path's ~9.2e10: route the unscaled
    *    BigInteger straight into the per-cell spill instead of letting
    *    `longValueExact` throw — the sum stays exact at any magnitude
    *    (the old DECIMAL(30,8) plan held 1e22 then nulled; here nothing
    *    is dropped).
    */
  private def addProduct(b: GramBuffer, c: Int, x: Double): Unit = {
    if (!java.lang.Double.isFinite(x)) return
    val unscaled = JBigDecimal.valueOf(x).setScale(8, RoundingMode.HALF_UP)
      .unscaledValue()
    if (unscaled.bitLength() < 64) b.add(c, unscaled.longValue())
    else b.addBig(c, unscaled)
  }

  override def update(b: GramBuffer, input: InternalRow): GramBuffer = {
    val raw = child.eval(input)
    if (raw == null) return b
    val arr = raw.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (b.aug == -1) b.init(d + 1)
    require(b.aug == d + 1,
      s"gram_moments: ragged embedding widths (${b.aug - 1} vs $d)")
    val aug = b.aug
    // hoist the float→double widening: one pass, then products
    val v = new Array[Double](aug)
    var i = 0
    while (i < d) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    v(d) = 1.0d
    var c = 0
    i = 0
    while (i < aug) {
      val vi = v(i)
      var j = i
      while (j < aug) {
        addProduct(b, c, vi * v(j))
        c += 1; j += 1
      }
      i += 1
    }
    b
  }

  override def merge(b: GramBuffer, o: GramBuffer): GramBuffer = {
    if (o.aug == -1) return b
    if (b.aug == -1) { b.init(o.aug); }
    require(b.aug == o.aug,
      s"gram_moments: merging buffers of different width (${b.aug} vs ${o.aug})")
    var c = 0
    while (c < b.cells) {
      if (o.bigs(c) != null) {
        b.bigs(c) =
          (if (b.bigs(c) == null) o.bigs(c) else b.bigs(c).add(o.bigs(c)))
      }
      b.add(c, o.longs(c))
      c += 1
    }
    b
  }

  override def eval(b: GramBuffer): Any = {
    if (b.aug == -1) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](b.cells)
    var c = 0
    while (c < b.cells) {
      out(c) = new JBigDecimal(b.total(c), 8).doubleValue()
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: GramBuffer): Array[Byte] = {
    if (b.aug == -1) return Array(-1, -1, -1, -1).map(_.toByte)
    val spills = (0 until b.cells).filter(b.bigs(_) != null)
      .map(c => c -> b.bigs(c).toByteArray)
    val buf = ByteBuffer.allocate(
      4 + 8 * b.cells + 4 + spills.map(8 + _._2.length).sum)
    buf.putInt(b.aug)
    var c = 0
    while (c < b.cells) { buf.putLong(b.longs(c)); c += 1 }
    buf.putInt(spills.size)
    spills.foreach { case (c, bytes) =>
      buf.putInt(c).putInt(bytes.length).put(bytes)
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new GramBuffer
    val aug = buf.getInt()
    if (aug == -1) return b
    b.init(aug)
    var c = 0
    while (c < b.cells) { b.longs(c) = buf.getLong(); c += 1 }
    val nSpill = buf.getInt()
    var s = 0
    while (s < nSpill) {
      val cell = buf.getInt()
      val arr = new Array[Byte](buf.getInt())
      buf.get(arr)
      b.bigs(cell) = new BigInteger(arr)
      s += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)
}

object GramMoments {
  val info = new ExpressionInfo(classOf[GramMoments].getName, "gram_moments")
  def build(children: Seq[Expression]): Expression = GramMoments(children.head)
}
