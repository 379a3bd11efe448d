package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen-capable Bloom-filter membership test over 64-bit hashes.
  *
  * `filter` must be a foldable BINARY expression holding a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the public spark-sketch
  * format produced by `BloomFilter.writeTo` / `DataFrameStatFunctions
  * .bloomFilter`); `value` is the LONG being probed. The filter is
  * deserialized ONCE (lazily, driver-side at codegen / first eval) and
  * enters generated code as a reference object — the per-row cost is two
  * hash mixes and two bit probes, no allocation, inside whole-stage
  * codegen.
  *
  * This is the scale pattern behind `decontam_bloom_prefilter`: a
  * compact sketch of the build side ships to every task and discards the
  * overwhelming majority of probe rows BEFORE any shuffle or exact join;
  * false positives (bounded by the filter's fpp) are then removed by the
  * exact join over the survivors, so the end-to-end result stays exact.
  */
case class BloomMightContainLong(filter: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = filter
  override def right: Expression = value

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (filter.dataType != BinaryType || !filter.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain_long: filter must be a BINARY literal")
    else if (value.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long: value must be LONG, got ${value.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = filter.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(f: Any, v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (_, v) => s"$bloomRef.mightContainLong($v)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomMightContainLong =
    copy(filter = newLeft, value = newRight)
}
