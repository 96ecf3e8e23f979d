package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for the integer dot product of two
  * `array<int>` quantization-code columns ([[graft.operators.Quantize]]
  * int8 codes), accumulating in long — whole-stage codegen'd.
  *
  * This is the stage-1 hot loop of
  * [[graft.operators.Similarity.quantizedKnn]]: evaluated once per
  * (query, candidate) pair over the WHOLE corpus, so the interpreted
  * `aggregate(zip_with(...))` formulation (one intermediate array
  * allocation + interpreted lambdas per pair) dominated the "cheap"
  * int8 pass. Same extension tier as [[CosineSimilarity]]: scalar,
  * codegen'd, registered by [[graft.GraftExtensions]].
  *
  * Semantics match the higher-order form exactly, including its null
  * algebra: `zip_with` pads a length mismatch with nulls and
  * `acc + null` poisons the fold, so mismatched lengths or any null
  * element yield NULL (not a partial sum).
  */
final case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true
  override def prettyName: String = "int_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i   = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  val FUNC_NAME = "int_dot"

  /** Column-level entry point; resolves through the function registry
    * (sessions must enable [[graft.GraftExtensions]]). */
  def apply(a: Column, b: Column): Column = call_function(FUNC_NAME, a, b)
}
