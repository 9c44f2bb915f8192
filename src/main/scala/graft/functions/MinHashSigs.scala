package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Fused MinHash signature kernel: all `nTables` per-table minima in one
  * pass over the shingle array.
  *
  * Values are bit-identical to the HOF formulation
  * `array_min(transform(shingles, s => xxhash64(s, lit(t))))` per table —
  * SQL `xxhash64(s, lit(t))` is hash(t, seed = hash(s, seed = 42)), so the
  * expensive byte hash of each shingle happens ONCE here and each table's
  * value is a cheap integer re-hash, vs the HOF tree hashing every
  * shingle's bytes `nTables` times (higher-order-function lambdas get no
  * common-subexpression elimination) and allocating an intermediate hash
  * array per (row, table).
  */
object MinHashSigsUtil {
  def sigs(shingles: ArrayData, nTables: Int): ArrayData = {
    val n = shingles.numElements()
    // HOF `array_min(transform(empty, …))` is null — mirror it rather than
    // emitting Long.MaxValue per table, which would make every empty doc
    // collide in every band
    if (n == 0) return null
    val mins = Array.fill(nTables)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // a null element in SQL `xxhash64(s, lit(t))` leaves the seed
      // untouched for s (hash skips null children), i.e. hs = 42
      val hs =
        if (shingles.isNullAt(i)) 42L
        else XxHash64Function.hash(shingles.getUTF8String(i), StringType, 42L)
      var t = 0
      while (t < nTables) {
        val h = XxHash64Function.hash(t, IntegerType, hs)
        if (h < mins(t)) mins(t) = h
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native expression: `minhash_sigs(array<string>, nTables)` →
  * array<long> of the per-table signed-min xxhash64 values (table index =
  * array position).
  */
case class MinHashSigs(child: Expression, nTables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null for an empty shingle array (HOF array_min semantics), even when
  // the child itself is non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigsUtil.sigs(input.asInstanceOf[ArrayData], nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSigsUtil.sigs($c, $nTables);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashBandsUtil {
  /** Banded-LSH bucket keys: minhash minima for bands·rowsPerBand tables
    * (identical to [[MinHashSigsUtil.sigs]]), then one 8-byte key per band
    * hashing the band index and its rowsPerBand consecutive minima
    * (xxhash64 fold, seed 42 — the same combine SQL `xxhash64(band, mh…)`
    * applies). Fused so the byte-hash of each shingle happens once and the
    * per-row output is b longs, not b·r — the smallest thing that can ride
    * the candidate self-join shuffle.
    */
  def keys(shingles: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    if (shingles.numElements() == 0) return null
    val mins = MinHashSigsUtil.sigs(shingles, bands * rowsPerBand)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b, IntegerType, 42L)
      var r = 0
      while (r < rowsPerBand) {
        h = XxHash64Function.hash(mins.getLong(b * rowsPerBand + r), LongType, h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression: `minhash_bands(array<string>, bands, rowsPerBand)` →
  * array<long> of per-band LSH bucket keys (band index = array position).
  * Null for an empty shingle array, mirroring [[MinHashSigs]].
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBandsUtil.keys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashBandsUtil.keys($c, $bands, $rowsPerBand);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
