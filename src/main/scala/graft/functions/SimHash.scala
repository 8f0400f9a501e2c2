package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{bit_count, concat, lit, transform, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash over an `array<long>` of feature hashes: per bit position, sum +1
  * when the feature hash has the bit set, -1 otherwise; the output bit is the
  * sign of the sum. Near-duplicate docs differ in few bits, so
  * `hamming(simhash(a), simhash(b)) <= k` is a constant-space near-dup test —
  * the classic Charikar scheme used by web-scale crawl dedup.
  *
  * Implemented as a native Catalyst expression WITH `doGenCode` so it stays
  * inside whole-stage codegen (a Scala UDF here would break the codegen span
  * for the whole projection — the hot path at corpus scale). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. Null array elements are
    * skipped. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Column API: simhash of an array<string> feature column (features are
    * xxhash64'd first). Spark 4's Column is ColumnNode-backed, so the
    * Expression bridge goes through the classic converters. */
  def simhash64(features: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      SimHash64(ColumnBridge.expression(transform(features, f => xxhash64(f)))))
  }

  /** [[simhash64]] over a SALTED feature hash (xxhash64 of salt-prefixed
    * features) — an independent 64-bit hash family. Two calls with distinct
    * salts compose a 128-bit signature (hi = salted, lo = unsalted): the
    * signature width BASELINE.md argues for at 100 TB, where 64-bit bands
    * get too narrow to keep LSH buckets sparse. */
  def simhash64Salted(features: Column, salt: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      SimHash64(ColumnBridge.expression(
        transform(features, f => xxhash64(concat(lit(salt), f))))))
  }

  /** Hamming distance between two simhash values — pure built-ins
    * (`bit_count(a XOR b)`), fully codegen'd. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
