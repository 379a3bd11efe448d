package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[SimhashSignature]] — public static so generated
  * code can call it.
  */
object SimhashUtil {

  /** Mirrors [[graft.dedup.Dedup.SimhashBits]] (kept literal so the
    * functions package stays dependency-free of the dedup package).
    */
  val Bits = 60

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Whole-document SimHash in one pass: split on single spaces
    * (Spark's `split(text, " ")` semantics — consecutive spaces yield
    * empty tokens, trailing empties kept), DISTINCT tokens, md5 per
    * token, majority vote over the md5's first 60 bits (hex char j/4,
    * bit j%4 — identical to the SQL
    * `(conv(substring(md5(tok), j/4+1, 1), 16, 10) >> (j%4)) & 1`
    * formulation), ties vote 0, packed little-endian into a positive
    * Long. Bit-identical to the explode → md5 → 60-sum aggregation
    * pipeline this replaces, so every SimHash oracle is unchanged.
    */
  def simhash(text: UTF8String): Long = {
    val md = mdLocal.get()
    val votes = new Array[Int](Bits)
    val seen = new java.util.HashSet[String]()
    val toks = text.toString.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) {
        md.reset()
        val digest = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < Bits) {
          val k = j >> 2 // hex-char index: 15 chars cover 60 bits
          val b = digest(k >> 1)
          val nibble = if ((k & 1) == 0) (b >> 4) & 0xf else b & 0xf
          votes(j) += (((nibble >> (j & 3)) & 1) << 1) - 1
          j += 1
        }
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) packed |= 1L << j
      j += 1
    }
    packed
  }
}

/** Codegen-capable whole-document SimHash fingerprint.
  *
  * Why not the explode → md5 → 60 conv/substring sums pipeline this
  * replaces: correct, but it materializes ~|distinct tokens| rows per
  * document through a projection and drags SIXTY sum columns through a
  * hash aggregation — the widest aggregation buffer in the repo. This
  * kernel computes the fingerprint in a tight per-row loop inside
  * whole-stage codegen — no explode, no aggregation, no exchange for the
  * fingerprint stage (the scan partitioning carries through), and the
  * banded hamming self-join consumes it directly. Same shape (and
  * measured win) as [[MinhashSignature]].
  */
case class SimhashSignature(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  // analysis-time contract (ADVICE r14, applied registry-wide)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_signature"

  override def nullSafeEval(input: Any): Any =
    SimhashUtil.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSignature =
    copy(child = newChild)
}
