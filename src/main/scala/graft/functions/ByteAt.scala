package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/**
 * Native codegen'd unsigned-byte extraction from a binary column:
 * `byte_at(bin, pos)` = the 1-based `pos`-th byte of `bin` as a long in
 * [0, 255], NULL when `pos` is out of range (the decode-what's-there
 * convention — reads past a truncated payload surface as null, exactly
 * like the `conv(hex(substring(bin, pos, 1)), 16, 10)` chain it
 * replaces FOR pos ≥ 1). Equivalence scope (r16 advice): for pos ≤ 0
 * this DELIBERATELY returns NULL, where Spark's substring would treat
 * pos 0 as 1 and a negative pos as from-the-end — a 1-based byte reader
 * has no meaningful negative index, and a silent tail read is exactly
 * the decode bug the null surfaces. All internal call sites use
 * pos ≥ 1; SQL callers of the registered function get the documented
 * null-for-nonpositive convention.
 *
 * Why a custom Expression (SURVEY §7.5 preference order): the built-in
 * chain allocates a 1-byte array copy, hex-encodes it into a UTF8String,
 * and radix-parses it back — three allocations and a string parse PER
 * PIXEL, evaluated inside interpreted HigherOrderFunction lambdas on the
 * media decode paths, where a 4×4-grid fingerprint reads every payload
 * byte. This is one bounds check and one mask in generated Java. Values
 * are bit-identical to the chain by construction (an in-range byte is an
 * exact two-digit hex parse), so oracles are unaffected.
 */
case class ByteAt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"byte_at requires (binary, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "byte_at"

  override protected def nullSafeEval(b: Any, p: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    val pos = p.asInstanceOf[Long]
    if (pos < 1L || pos > bytes.length) null
    else (bytes((pos - 1L).toInt) & 0xff).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) => {
      s"""
         |if ($p < 1L || $p > ($b).length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (long) (($b)[(int) ($p - 1L)] & 0xff);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteAt =
    copy(left = newLeft, right = newRight)
}
