package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a static word set, as ONE native
  * codegen expression.
  *
  * The composable form — `size(filter(toks, t => array_contains(set, t)))` —
  * evaluates its lambda interpreted (higher-order functions have no codegen
  * path), re-materializes a filtered array per call, and scans the word list
  * linearly per token. Language ID evaluates FIVE of those per document and
  * quality scoring two more; at sf0.1 that interpreted fan-out made
  * `text_langid` a ~7 s query for a narrow scan. This expression is a single
  * primitive loop over the token array with an O(1) hash-set probe per token,
  * allocates nothing, and stays inside whole-stage codegen — so the shared
  * `split()` feeding several counts is also eliminated as a common
  * subexpression instead of re-run per interpreted lambda.
  *
  * Semantics (identical to the HOF form, which remains the executable spec in
  * [[graft.operators.TextOps]]): every element equal to a set member counts,
  * including repeats; null elements never match.
  */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set requires array<string>, got $other")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    CountInSet.buildSet(words)

  override def nullSafeEval(input: Any): Any =
    CountInSet.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw type: janino's generics support is too limited for HashSet<UTF8String>
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInSet.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
  override def prettyName: String = "count_in_set"
}

object CountInSet {

  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(words.size * 2, 8))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Shared kernel for interpreted eval and generated code. */
  def compute(toks: ArrayData, set: java.util.HashSet[_]): Int = {
    val n = toks.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  /** Column API: occurrences of `words` members in an array<string> column. */
  def countInSetNative(tokens: Column, words: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(tokens), words))
}
