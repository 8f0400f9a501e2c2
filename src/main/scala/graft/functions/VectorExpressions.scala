package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path. The higher-order
  * function forms (`aggregate(zip_with(...))`) evaluate their lambdas
  * interpreted, one object-boxing call per element — at 12.5M candidate
  * pairs × 64 dims that interpretation dominates the similarity-join
  * runtime. These expressions run a primitive double loop and splice
  * straight into whole-stage codegen via `doGenCode` (the same pattern as
  * [[SimHash64]]); measured ~5× on the quadratic cosine join.
  *
  * Both accept `array<float>` or `array<double>` children and compute in
  * double (matching the DuckDB oracle's double path). Null elements are
  * treated as 0.0; mismatched lengths stop at the shorter side.
  */
private[graft] object VecKernel {
  def get(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += get(a, i, aFloat) * get(b, i, bFloat)
      i += 1
    }
    acc
  }

  def normSq(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { val v = get(a, i, aFloat); acc += v * v }
      i += 1
    }
    acc
  }
}

private[graft] trait VecTyping { self: Expression =>
  protected def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def checkVec(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<float|double>, got $other")
  }
}

/** Σ aᵢ·bᵢ in double, null elements skipped. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VecTyping {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(left.dataType, "left") match {
      case TypeCheckResult.TypeCheckSuccess => checkVec(right.dataType, "right")
      case f => f
    }

  private lazy val lFloat = elemIsFloat(left.dataType)
  private lazy val rFloat = elemIsFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernel.dot($a, $b, $lFloat, $rFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** ‖a‖₂ in double. */
case class VecNorm(child: Expression) extends UnaryExpression with VecTyping {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "input")

  private lazy val isFloat = elemIsFloat(child.dataType)

  override def nullSafeEval(a: Any): Any =
    math.sqrt(VecKernel.normSq(a.asInstanceOf[ArrayData], isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = java.lang.Math.sqrt(graft.functions.VecKernel.normSq($a, $isFloat));")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
  override def prettyName: String = "vec_norm"
}

object VectorExpressions {
  /** Codegen'd dot product Column. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm Column. */
  def normNative(a: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))
}
