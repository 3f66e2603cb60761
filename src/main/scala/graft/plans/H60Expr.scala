package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the engine's shared 60-bit hash primitive
  * (graft.functions.Fns.h60).
  *
  * Bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)::long`: the
  * first 15 hex characters of an md5 are exactly the first 60 bits of the
  * digest, so this reads bytes 0–6 plus the high nibble of byte 7 straight
  * out of the 16-byte digest — skipping the 32-char hex encode, the
  * substring, and conv()'s per-character base-16 parse that the composed
  * form pays per row. The DuckDB oracle mirror is unchanged:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *
  * Scale: h60 sits in the hot path of MinHash/SimHash/fingerprinting
  * (one call per shingle/token — hundreds of millions of rows per TB), so
  * digest-direct extraction and staying inside whole-stage codegen matter.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // Accepts string (hashes UTF-8 bytes) or binary (hashes raw bytes) —
  // identical results for a string vs its binary cast, matching
  // md5(str)'s implicit cast-to-binary.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"h60 requires a string or binary input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    H60.first60Bits(H60.localMd5.get().digest(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState(
      "java.security.MessageDigest", "graftH60Md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    val toBytes =
      if (child.dataType == BinaryType) (s: String) => s
      else (s: String) => s"$s.getBytes()"
    defineCodeGen(ctx, ev, s =>
      s"graft.plans.H60.first60Bits($md.digest(${toBytes(s)}))")
  }

  override protected def withNewChildInternal(c: Expression): H60 =
    copy(child = c)
}

object H60 {
  /** MessageDigest is stateful; interpreted eval may share an Expression
    * across threads in local mode, so keep one digest per thread.
    * (`digest()` resets the instance after each call.)
    */
  private[plans] val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of a digest: bytes 0–6 and the high nibble of byte 7 —
    * the value `conv(substr(hex, 1, 15), 16, 10)` parses.
    */
  def first60Bits(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)

  /** Column entry point; callers cast to string first (Fns.h60 does). */
  def apply(c: Column): Column =
    SqlBridge.column(H60(SqlBridge.expression(c)))
}
