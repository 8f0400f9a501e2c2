package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** First 48 bits of md5 over a binary column as a non-negative BIGINT —
  * bit-identical to `conv(substring(md5(x), 1, 12), 16, 10)` (the first 12
  * hex chars ARE the first 6 digest bytes big-endian) without materializing
  * the 32-char hex string and parsing it back: one digest, six shifts.
  *
  * This is the engine's cross-engine-reproducible hash basis (the md5-48
  * fold any md5-capable system can replicate): MinHash/SimHash signature
  * variants, deterministic content-hash sampling and the multimodal
  * fake-decode basis points all route through it, so the two heaviest bench
  * queries (the signature aggregations, which evaluate it once per token
  * occurrence) ride whole-stage codegen with no string detour. The hex/conv
  * built-in composition survives as [[graft.operators.Dedup.md5Hash48Hex]],
  * the differential-tested executable spec. */
case class Md5Hash48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash48 requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hash48.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash48.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash48 =
    copy(child = newChild)

  override def prettyName: String = "md5_hash48"
}

object Md5Hash48 {
  /** Shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Column API over a binary column (cast strings upstream). */
  def md5hash48(bytes: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Md5Hash48(ColumnBridge.expression(bytes)))
  }
}
