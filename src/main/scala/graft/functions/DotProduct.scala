package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the double dot product of two
  * float/double array columns — whole-stage codegen'd, element types
  * may differ per side (an `array<float>` embedding against an
  * `array<double>` literal centroid or projection vector).
  *
  * This is the shared hot loop of [[graft.operators.Kmeans]] (one
  * evaluation per row per centroid) and
  * [[graft.operators.Projection]] (one per row per output dimension):
  * at 100 TB those run trillions of times, so the interpreted
  * `aggregate(zip_with(...))` formulation (intermediate array + lambda
  * dispatch per call) is the difference between a scan-bound and a
  * CPU-bound pipeline. Same extension tier as [[CosineSimilarity]]:
  * scalar, codegen'd, registered by [[graft.GraftExtensions]].
  *
  * Semantics match the sequential fold: left-to-right double
  * accumulation over the shorter length (mirroring [[CosineSimilarity]]).
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = DotProduct.FUNC_NAME

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> arguments, " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n  = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // accessor is picked per side at codegen time — the loop body
      // stays branch-free
      val ax  = if (isFloat(left.dataType)) s"(double) $a.getFloat($i)"
                else s"$a.getDouble($i)"
      val bx  = if (isFloat(right.dataType)) s"(double) $b.getFloat($i)"
                else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $ax * $bx;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val FUNC_NAME = "dot_product"

  /** Column-level entry point; resolves through the function registry
    * (sessions must enable [[graft.GraftExtensions]]). */
  def apply(a: Column, b: Column): Column = call_function(FUNC_NAME, a, b)
}
