package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native codegen'd expression for the engine-portable 60-bit md5 base
  * hash: the first 15 hex digits of md5(input) as a long — numerically
  * identical to `conv(substring(md5(x), 1, 15), 16, 10) :: long`, but
  * fused: no 32-char hex string is materialized and re-parsed per value.
  * This is the hash under every deterministic sampling/split threshold
  * and the md5 MinHash/SimHash families, i.e. it runs once per shingle
  * and once per token at corpus scale.
  *
  * Stays inside whole-stage codegen (the generated code calls the
  * static hasher); a Scala UDF here would break the codegen span of the
  * projections it appears in.
  */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 expects binary, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60Expr.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix60Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60Expr {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): big-endian value of the first 8 digest
    * bytes, shifted right 4 — exactly the integer the first 15 hex
    * characters encode.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
