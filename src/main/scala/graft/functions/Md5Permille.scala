package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[Md5Permille]] — public static so generated code can
  * call it.
  */
object Md5PermilleUtil {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(salt || ':' || id), 1, 15), 16, 10) % 1000000`,
    * computed without the per-row MessageDigest.getInstance that Spark's
    * `md5` expression pays (commons-codec allocates a fresh digest per
    * call) and without the hex-UTF8String → substring → conv string
    * round-trip: the first 15 hex characters of the digest ARE its first
    * 15 nibbles read high-first, so the value is accumulated straight
    * from the digest bytes. Bit-identical to the Column formula
    * (pinned by FunctionsSpec on randomized inputs), so every DuckDB
    * oracle mirroring `('0x' || substr(md5(...),1,15))::BIGINT % 1000000`
    * is unchanged.
    */
  def permille(saltColon: Array[Byte], id: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(saltColon)
    md.update(id.getBytes)
    val digest = md.digest()
    var v = 0L
    var k = 0
    while (k < 15) {
      val b = digest(k >> 1)
      val nibble = if ((k & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nibble
      k += 1
    }
    v % 1000000L
  }
}

/** Codegen-capable salted md5-permille hash — the deterministic
  * pseudo-random primitive behind the split/sample/permutation family
  * (train/val/test assignment, balanced sampling, permutation tests, BH
  * FDR): uniform on [0, 1e6), a pure function of (salt, id), identical
  * across engines because md5 is the one hash DuckDB and Spark share.
  *
  * Why not the `conv(substring(md5(concat(...)),1,15),16,10) % 1e6`
  * Column formula this wraps: arithmetic-identical, but Spark's `Md5`
  * calls commons-codec `md5Hex`, which allocates a NEW MessageDigest per
  * row and materializes a 32-char hex UTF8String that `substring`/`conv`
  * then re-parse — measured 4-5× the cost of the digest itself on the
  * r14 honest-materializer sweep, where the 64-rep permutation kernels
  * (bh_fdr_control: 32M hashes at sf0.1) became the bench's top cost.
  * The salt is a compile-time constant, so its `salt:` prefix bytes are
  * baked into the expression once, not concatenated per row.
  */
case class Md5Permille(child: Expression, salt: String) extends UnaryExpression
    with ExpectsInputTypes {

  // analysis-time contract (ADVICE r14): md5_permille is a registered
  // session SQL function, so a non-string id must fail resolution, not
  // surface as a runtime ClassCastException / Janino compile error
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_permille"

  @transient private lazy val saltBytes: Array[Byte] =
    (salt + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(input: Any): Any =
    Md5PermilleUtil.permille(saltBytes, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("saltColon", saltBytes, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5PermilleUtil.permille($saltRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Permille =
    copy(child = newChild)
}
