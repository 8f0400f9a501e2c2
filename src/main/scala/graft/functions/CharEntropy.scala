package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-distribution entropy in exact integer centibits
  * per char, as ONE native codegen expression.
  *
  * Semantics are IDENTICAL to the composable explode form (which remains the
  * executable spec in [[graft.operators.TextOps.charEntropyExplode]] and the
  * DuckDB oracle): per code point class c with count cnt_c in a doc of n
  * code points, bits_c = ⌊log₂(n div cnt_c)⌋ (exact integer: the `bin()`
  * string-length log), entropy_cb = (Σ_c cnt_c·bits_c)·100 div n; empty
  * docs score 0.
  *
  * Why an expression: the explode form materializes ONE ROW PER CHARACTER
  * before its (map-side-combined) aggregate — the shuffle stays
  * |docs|·|alphabet|-bounded, but the explode itself is a corpus-character
  * row amplification that made text_char_entropy the most linear query in
  * the text family (8.0× at 10× rows, BASELINE.md round-8). This kernel
  * folds the histogram per document inside whole-stage codegen: one pass
  * collecting code points, one sort + run-length pass for the class counts
  * — no per-char rows, no shuffle beyond the narrow scan.
  *
  * Code-point semantics (NOT UTF-16 units) to match Spark's
  * `substring(text, i, 1)` / `length()` and DuckDB's 1-based `substr` —
  * surrogate pairs count once and class as themselves. */
case class CharEntropyCb(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_cb requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropyCb.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyCb.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyCb =
    copy(child = newChild)
  override def prettyName: String = "char_entropy_cb"
}

object CharEntropyCb {

  /** Shared kernel for interpreted eval and generated code. Sort +
    * run-length instead of a hash map: code-point arrays are small, the
    * sort is allocation-light, and run counting is branch-predictable. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0L
    val cps = new Array[Int](len)
    var i = 0
    var n = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, n)
    var sumBits = 0L
    var start = 0
    var j = 1
    while (j <= n) {
      if (j == n || cps(j) != cps(start)) {
        val cnt = j - start
        // ⌊log₂(n div cnt)⌋ = 63 − nlz: the bin()-length exact-integer log
        val bits = 63 - java.lang.Long.numberOfLeadingZeros((n / cnt).toLong)
        sumBits += cnt.toLong * bits
        start = j
      }
      j += 1
    }
    sumBits * 100L / n
  }

  /** Column API: integer centibits/char entropy of a string column. */
  def charEntropyCb(text: Column): Column =
    ColumnBridge.column(CharEntropyCb(ColumnBridge.expression(text)))
}
