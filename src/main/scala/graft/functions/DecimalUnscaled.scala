package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RuntimeReplaceable, UnaryExpression, UnscaledValue}
import org.apache.spark.sql.types.{Decimal, DecimalType}

/** Analysis-checked front for Catalyst's internal [[UnscaledValue]]
  * (a compact decimal's unscaled long — e.g. `decimal(18,6)` → exact
  * micro-units — without the widening multiply a `* 10^s` cast chain
  * pays per row).
  *
  * Registering `UnscaledValue` bare would accept ANY input: a
  * non-decimal column fails at executor runtime (ClassCastException
  * mid-job) instead of analysis time, and a decimal wider than
  * precision 18 is not stored compactly — its unscaled value silently
  * truncates to a long. This wrapper moves both failures to analysis:
  * it requires `DecimalType` with precision ≤ 18 (`MAX_LONG_DIGITS`,
  * the compact-storage bound) and then replaces itself with the real
  * expression during optimization ([[RuntimeReplaceable]]), so the
  * executed plan is byte-identical to the bare registration. */
case class DecimalUnscaled(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = UnscaledValue(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      TypeCheckResult.TypeCheckSuccess
    case d: DecimalType =>
      TypeCheckResult.TypeCheckFailure(
        s"decimal_unscaled requires a compactly-stored decimal " +
          s"(precision <= ${Decimal.MAX_LONG_DIGITS}); " +
          s"${d.simpleString} can exceed a long's range and would truncate")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"decimal_unscaled requires a DECIMAL argument, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(newChild: Expression): DecimalUnscaled =
    copy(child = newChild)
}
