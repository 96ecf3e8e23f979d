package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Add, And, AttributeReference, BinaryExpression, EvalMode, Expression, If,
  IsNull, Literal, Multiply, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, Decimal, DecimalType, LongType}

/** Exact Σ x·y over long inputs with a 128-bit two's-complement
  * accumulator — the native aggregate behind
  * [[graft.operators.Profile.moments]]' second-moment sums.
  *
  * Why it exists: the declarative alternative is
  * `sum(CAST(x*y AS DECIMAL(38,12)))`, and Spark decimals above
  * precision 18 leave the compact long representation — every row pays
  * a BigDecimal allocate-add in the hot aggregation loop (measured
  * 7.3s for 60 such sums over sf0.1 lineitem). Here the buffer is two
  * LONG slots (hi, lo) plus an emptiness flag; the per-row update is
  * pure long arithmetic — Hacker's-Delight 64×64→128 multiply
  * (`Math.multiplyHigh`'s derivation spelled out in Catalyst
  * expressions) and a carry-propagating 128-bit add — all inside
  * whole-stage codegen, with wrapping (LEGACY) arithmetic so ANSI
  * overflow checks never fire on the intentional wraps.
  *
  * Inputs are FIXED-POINT scaled longs (the caller picks the scale,
  * e.g. micro-units); the result is the exact 128-bit integer sum
  * rendered as DECIMAL(38,12) — callers feeding micro-scaled (1e6)
  * inputs get micro² (1e12) products, hence the scale-12 render.
  * Headroom: ±1.7e38 in the accumulator, ±1e26 in the rendered
  * decimal — overflow of the render throws rather than truncates.
  *
  * Null algebra matches SQL `sum(x*y)`: a row with either side null
  * contributes nothing; a group with no contributing row is NULL.
  * Registered by [[graft.GraftExtensions]] as `sum_product_128`;
  * merge is the same carry add, so partial aggregation (map-side
  * combine) works unchanged.
  */
final case class SumProduct128(left: Expression, right: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean         = true
  override def dataType: DataType        = DecimalType(38, 12)
  override def prettyName: String        = "sum_product_128"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumProduct128 =
    copy(left = newChildren(0), right = newChildren(1))

  private lazy val hi    = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo    = AttributeReference("lo", LongType, nullable = false)()
  private lazy val empty = AttributeReference("empty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, empty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  // ---- wrapping long arithmetic (ANSI must not see these overflows).
  // MulHigh/CarryOut are the engine's own tiny scalars: inlining their
  // math as ~20-node Catalyst trees PER AGGREGATE made a 60-aggregate
  // moments query generate source Janino needed seconds to compile on
  // every (re)plan; as single codegen'd calls the generated code stays
  // small and MulHigh lowers to the Math.multiplyHigh JIT intrinsic.
  private def mulW(a: Expression, b: Expression) = Multiply(a, b, EvalMode.LEGACY)
  private def addW(a: Expression, b: Expression) = Add(a, b, EvalMode.LEGACY)

  /** (hi, lo) += (phi, plo), two's complement 128-bit. */
  private def add128(
      hiA: Expression, loA: Expression, phi: Expression, plo: Expression
  ): (Expression, Expression) = {
    val loS = addW(loA, plo)
    (addW(addW(hiA, phi), CarryOut(loA, plo)), loS)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = Not(Or(IsNull(left), IsNull(right)))
    val plo   = mulW(left, right)
    val phi   = MulHigh(left, right)
    val (nHi, nLo) = add128(hi, lo, phi, plo)
    Seq(
      If(valid, nHi, hi),
      If(valid, nLo, lo),
      And(empty, Not(valid)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(nHi, nLo, And(empty.left, empty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(empty,
      Literal.create(null, DecimalType(38, 12)),
      Int128ToDecimal(hi, lo))
}

/** High 64 bits of the signed 64×64 product — codegen lowers to the
  * `Math.multiplyHigh` JIT intrinsic. Null iff an input is null. */
final case class MulHigh(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = left.nullable || right.nullable
  override def prettyName: String = "mul_high"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MulHigh =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    Math.multiplyHigh(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.multiplyHigh($a, $b)")
}

/** Carry-out (0 or 1) of the unsigned 64-bit add `a + b` —
  * ((a & b) | ((a | b) & ~(a + b))) >>> 63. */
final case class CarryOut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = left.nullable || right.nullable
  override def prettyName: String = "carry_out"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CarryOut =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[Long]
    val b = bAny.asInstanceOf[Long]
    ((a & b) | ((a | b) & ~(a + b))) >>> 63
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"((($a & $b) | (($a | $b) & ~($a + $b))) >>> 63)")
}

/** Render a two's-complement (hi, lo) 128-bit integer as
  * DECIMAL(38,12) — the group-final step of [[SumProduct128]]
  * (evaluated once per group). */
final case class Int128ToDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 12)
  override def nullable: Boolean  = true
  override def prettyName: String = "int128_to_decimal"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(hiAny: Any, loAny: Any): Any =
    SumProduct128.toDecimal(hiAny.asInstanceOf[Long], loAny.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) =>
      s"${ev.value} = graft.functions.SumProduct128.toDecimal($h, $l);")
}

object SumProduct128 {
  val FUNC_NAME = "sum_product_128"

  /** Exact (hi, lo) → DECIMAL(38,12); overflow throws rather than
    * truncates. Called from generated code. */
  def toDecimal(hi: Long, lo: Long): Decimal = {
    val v = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    val d = Decimal(new java.math.BigDecimal(v, 12))
    if (!d.changePrecision(38, 12))
      throw new ArithmeticException(
        s"sum_product_128 result $v (scale 12) overflows DECIMAL(38,12)")
    d
  }
}
