package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[WordShingles]] — called from generated code, so it
  * must be a public static (Java-visible) method.
  */
object ShingleUtil {
  /** Word n-grams of a single-space-tokenized string.
    *
    * Key identity: joining `split(text, ' ')[i..i+n-1]` with a single
    * space reconstructs the original bytes between the token boundaries —
    * even around empty tokens from repeated spaces — so every shingle is a
    * plain substring between space positions. No per-token objects, no
    * array slices: one indexOf sweep + one substring per shingle.
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    var spaces = 0
    var i = s.indexOf(' ')
    while (i >= 0) { spaces += 1; i = s.indexOf(' ', i + 1) }
    val numTokens = spaces + 1
    val out = new Array[AnyRef](math.max(numTokens - n + 1, 0))
    if (out.length == 0) return new GenericArrayData(out)
    // pos(k) = index of k-th space; pos(0) = -1; pos(numTokens) = length
    val pos = new Array[Int](numTokens + 1)
    pos(0) = -1
    var k = 1
    i = s.indexOf(' ')
    while (i >= 0) { pos(k) = i; k += 1; i = s.indexOf(' ', i + 1) }
    pos(numTokens) = s.length
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromString(s.substring(pos(j) + 1, pos(j + n)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen-capable word-n-gram shingle expression.
  *
  * Why not `transform(sequence(...), i -> concat_ws(' ', slice(...)))`:
  * higher-order functions are CodegenFallback in Spark — the interpreted
  * lambda chain measured ~170k shingle-rows/s and dominated the whole
  * MinHash pipeline (SURVEY.md §7.3 anticipated exactly this escalation:
  * "custom Expression if profiling demands"). This kernel stays inside
  * whole-stage codegen and allocates one string per shingle.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  // analysis-time contract (ADVICE r14, applied registry-wide): a
  // non-string argument to the registered SQL function must fail
  // resolution, not surface as a runtime ClassCastException
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Column-API entry point: `word_shingles($"text", 3)`. */
  def word_shingles(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    GraftFunctions.wordShingles(text, n)
}
