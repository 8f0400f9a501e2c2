package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** 128-bit perceptual-style block signature over a raw binary payload, as
  * ONE native codegen expression — the average-hash (aHash) family applied
  * to opaque multimodal payloads.
  *
  * Semantics: the payload's n bytes are divided into 128 equal-measure
  * blocks (block b covers byte indices [⌊b·n/128⌋, ⌊(b+1)·n/128⌋)); bit b
  * is set iff the block's byte-sum mean exceeds the whole-payload mean,
  * compared integer-exactly as `blockSum·n > total·blockLen` (ties → 0;
  * empty payloads and empty blocks → 0). A localized edit perturbs one
  * block's mean — a handful of threshold-adjacent bits — so recompressed /
  * lightly-edited assets land within a small hamming distance, where a
  * cryptographic content hash flips every bit. For real images the decoder
  * (stubbed in [[graft.operators.Multimodal]]) substitutes a luma grid for
  * the raw bytes; the signature shape, the banded hamming join downstream
  * ([[graft.operators.Dedup.simHashNearDupPairs128]]) and the whole plan
  * are unchanged by that swap.
  *
  * Output: `array<long>` of exactly [hi, lo] — bits 64–127 and 0–63 — the
  * (hi, lo) two-word layout the 128-bit banded hamming join consumes.
  * Why a native expression: per-byte folds over binary have no codegen'd
  * higher-order form (hex-string `transform`/`aggregate` lambdas fall out
  * of whole-stage codegen and re-walk the payload per block); this kernel
  * is one pass over the bytes inside codegen, no amplification, no shuffle.
  * Integer-exactness bound: `total·blockLen ≤ 255·n²` — exact in a signed
  * long for payloads up to ~2²⁶ bytes (64 MiB), far past any document or
  * decoded-grid payload here. */
case class BlockHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"block_hash128 requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(BlockHash128.compute(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.BlockHash128.compute($c));")

  override protected def withNewChildInternal(newChild: Expression): BlockHash128 =
    copy(child = newChild)
  override def prettyName: String = "block_hash128"
}

object BlockHash128 {
  val Blocks = 128

  /** Shared kernel for interpreted eval and generated code: one pass for
    * per-block byte sums + the total, one pass over the 128 blocks for the
    * integer-exact mean threshold. Returns [hi, lo]. */
  def compute(payload: Array[Byte]): Array[Long] = {
    val out = new Array[Long](2)
    val n = payload.length
    if (n == 0) return out
    val sums = new Array[Long](Blocks)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = (payload(i) & 0xFF).toLong
      // block of byte i = the largest b with ⌊b·n/B⌋ ≤ i, i.e.
      // ⌊((i+1)·B − 1)/n⌋ — NOT ⌊i·B/n⌋, which misassigns bytes to
      // empty blocks when n < B or n ∤ B (1-byte payload: the byte lives
      // in block 127, the only non-empty interval)
      sums((((i + 1).toLong * Blocks - 1) / n).toInt) += v
      total += v
      i += 1
    }
    var b = 0
    while (b < Blocks) {
      val len = (b + 1).toLong * n / Blocks - b.toLong * n / Blocks
      if (sums(b) * n > total * len) {
        if (b < 64) out(1) |= 1L << b
        else out(0) |= 1L << (b - 64)
      }
      b += 1
    }
    out
  }

  /** Column API: [hi, lo] 128-bit block signature of a binary column. */
  def blockHash128(payload: Column): Column =
    ColumnBridge.column(BlockHash128(ColumnBridge.expression(payload)))
}
