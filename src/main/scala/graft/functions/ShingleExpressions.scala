package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as ONE native codegen expression.
  *
  * The composable form — `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i+1, n))))` — evaluates its lambda interpreted,
  * with per-position Column-tree evaluation and array allocation; measured
  * ~1 ms/doc, which multiplied across the several re-materializations inside
  * the dedup joins dominated their runtime at sf0.1. This expression runs a
  * single primitive loop with an insertion-ordered set (~µs/doc) and stays
  * inside whole-stage codegen.
  *
  * Semantics (identical to [[graft.operators.Dedup.shingles]]'s HOF form,
  * which remains as the executable spec): fewer than n tokens → a single
  * shingle of all tokens space-joined; duplicates dropped keeping first
  * occurrence order.
  */
case class NGramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles requires array<string> tokens, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NGramShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
  override def prettyName: String = "ngram_shingles"
}

object NGramShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared kernel for interpreted eval and generated code. Null tokens are
    * treated as empty strings (concat_ws semantics in the HOF form skip
    * nulls; token arrays from split() never contain nulls in practice). */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (total < n) {
      val all = new Array[UTF8String](total)
      var i = 0
      while (i < total) { all(i) = tok(i); i += 1 }
      out.add(UTF8String.concatWs(Space, all: _*))
    } else {
      var start = 0
      val gram = new Array[UTF8String](n)
      while (start <= total - n) {
        var j = 0
        while (j < n) { gram(j) = tok(start + j); j += 1 }
        out.add(UTF8String.concatWs(Space, gram: _*))
        start += 1
      }
    }
    val arr = new Array[AnyRef](out.size())
    out.toArray(arr)
    new GenericArrayData(arr)
  }

  /** Column API over a tokens column. */
  def shinglesNative(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramShingles(ColumnBridge.expression(tokens), n))
}
