package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[MinhashSignature]] — public static so generated
  * code can call it.
  */
object MinhashUtil {
  /** Mirrors [[graft.dedup.Dedup.MinhashMod]] (kept literal here so the
    * functions package stays dependency-free of the dedup package).
    */
  val Mod: Long = 1000000007L

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Full MinHash signature of a document in one pass: for each word
    * n-gram shingle, md5 → two 60-bit halves h1/h2 (the top 15 hex chars
    * of each 8-byte half — identical to SQL
    * `conv(substring(md5(s), 1, 15), 16, 10) % Mod` /
    * `conv(substring(md5(s), 17, 15), 16, 10) % Mod`, since 15 hex
    * digits are exactly the high 60 bits of the big-endian half) →
    * affine family (h1 + i·h2) % Mod → running minima. Returns null for
    * documents with fewer than `n` tokens (no shingles — they can never
    * be LSH candidates), matching the pipeline's pre-filter.
    */
  def signature(text: UTF8String, numHashes: Int, n: Int): ArrayData = {
    val sh = ShingleUtil.shingles(text, n)
    val m = sh.numElements()
    if (m == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = mdLocal.get()
    var j = 0
    while (j < m) {
      md.reset()
      val digest = md.digest(sh.getUTF8String(j).getBytes)
      var half0 = 0L; var half1 = 0L
      var b = 0
      while (b < 8) {
        half0 = (half0 << 8) | (digest(b) & 0xffL)
        half1 = (half1 << 8) | (digest(b + 8) & 0xffL)
        b += 1
      }
      val h1 = (half0 >>> 4) % Mod
      val h2 = (half1 >>> 4) % Mod
      var i = 0
      var h = h1
      while (i < numHashes) {
        if (h < mins(i)) mins(i) = h
        i += 1
        h = (h1 + i * h2) % Mod
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Codegen-capable whole-document MinHash signature.
  *
  * Why not the explode → md5 → 16 min() aggregations pipeline this
  * replaces: correct and HashAggregate-fast, but it materializes ~|tokens|
  * shingle rows per document through two projections and a per-row
  * aggregation-map probe. This kernel computes the signature in a tight
  * per-row loop inside whole-stage codegen — no explode, no aggregation,
  * and the signature stage needs no exchange at all (the scan partitioning
  * carries through). Arithmetic is bit-identical to the SQL formulation,
  * so the DuckDB oracles are unchanged.
  */
case class MinhashSignature(child: Expression, numHashes: Int, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1 && numHashes <= 16,
    "numHashes must be in [1, 16] (h1 + 15·h2 < 2^35 bounds the affine family)")
  require(n >= 1, "shingle size must be >= 1")

  // analysis-time contract (ADVICE r14, applied registry-wide)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinhashUtil.signature(input.asInstanceOf[UTF8String], numHashes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashUtil.signature($c, $numHashes, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
