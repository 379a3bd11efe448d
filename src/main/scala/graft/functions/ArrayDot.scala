package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel for [[ArrayDot]] — called from generated code. */
object ArrayDotUtil {
  /** Sequential left-fold dot product in double precision: bit-identical to
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, +)` and to DuckDB's
    * `list_reduce(list_prepend(0.0, list_transform(...)), +)` — the oracle
    * comparison depends on this exact accumulation order.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"array_dot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element would read as 0.0 from UnsafeArrayData and silently
      // corrupt the score — fail loudly instead (the HOF this replaced
      // yielded a null result; a thrown error is the safer divergence)
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"array_dot: null element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Codegen-capable dot product over numeric arrays (float or double
  * elements; floats are widened exactly). Replaces the interpreted
  * zip_with+aggregate HOF chain, which dominated the similarity queries
  * (HOFs are CodegenFallback in Spark).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  // analysis-time contract (ADVICE r14, applied registry-wide): each side
  // independently array<float> or array<double> — a TypeCollection under
  // ExpectsInputTypes can't express the per-side independence, so the
  // check is explicit
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot expects array<float|double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"array_dot expects array<float|double>, got $other")
  }
  private lazy val aFloat = elemIsFloat(left)
  private lazy val bFloat = elemIsFloat(right)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayDotUtil.dot($a, $b, $aFloat, $bFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDot = copy(left = newLeft, right = newRight)
}
