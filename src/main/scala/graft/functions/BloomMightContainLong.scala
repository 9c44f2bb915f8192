package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe over a BROADCAST filter —
  * the fact-scan-side half of a runtime semi-join filter (x10).
  *
  * Same semantics as Spark's internal `BloomFilterMightContain`, but the
  * sketch arrives as a `Broadcast` handle instead of an inlined binary
  * literal: the bitmap ships to each executor once via the broadcast
  * mechanism (torrent blocks, MB-scale) rather than riding inside every
  * serialized plan/task, and `value()` resolves it once per operator
  * instance, not per row. Unlike the Scala-UDF formulation this stays
  * inside whole-stage codegen, so the pruning filter adds one virtual call
  * per row on the fact scan instead of breaking the codegen span exactly
  * where throughput matters.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    // resolve the broadcast once per operator instance (mutable state),
    // not per row: value() is a block-manager lookup, not a field read
    val filterTerm = ctx.addMutableState(bfClass, "graftBloom",
      v => s"$v = ($bfClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $filterTerm.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  /** Column form: `mightContain(bloomBc, $"key")`. */
  def apply(bloom: Broadcast[BloomFilter], key: Column): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bloom))
}
