package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{CosineSimilarity, DotProduct, IntDotProduct, SumProduct128}

/** Session extensions: registers the engine's native Catalyst
  * expressions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Besides the engine's own [[graft.functions.CosineSimilarity]], this
  * surfaces Spark's internal bloom-filter pair (the codegen'd
  * expressions behind runtime row-level filtering) as callable
  * functions: `bloom_filter_build(xxhash64(v), estItems, numBits)` →
  * binary, and `bloom_filter_contains(filterBinary, xxhash64(v))` →
  * boolean. The filter argument of `bloom_filter_contains` must be
  * foldable (a literal), which is exactly how
  * [[graft.operators.Decontaminate]] uses it: build distributed,
  * collect the one serialized filter row, embed as a literal.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.FUNC_NAME),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.FUNC_NAME),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"${CosineSimilarity.FUNC_NAME} takes 2 arguments")
        CosineSimilarity(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(IntDotProduct.FUNC_NAME),
      new ExpressionInfo(classOf[IntDotProduct].getName, IntDotProduct.FUNC_NAME),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"${IntDotProduct.FUNC_NAME} takes 2 arguments")
        IntDotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(DotProduct.FUNC_NAME),
      new ExpressionInfo(classOf[DotProduct].getName, DotProduct.FUNC_NAME),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"${DotProduct.FUNC_NAME} takes 2 arguments")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(SumProduct128.FUNC_NAME),
      new ExpressionInfo(classOf[SumProduct128].getName, SumProduct128.FUNC_NAME),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"${SumProduct128.FUNC_NAME} takes 2 arguments")
        SumProduct128(children(0), children(1))
      }))
    ext.injectFunction((
      // a compact decimal's unscaled long (e.g. decimal(18,6) -> exact
      // micro-units) without the widening multiply a `* 10^s` cast
      // chain pays per row — feeds sum_product_128. Registered through
      // the analysis-checked wrapper: non-decimal or wider-than-18
      // inputs fail at analysis, never as an executor ClassCastException
      FunctionIdentifier("decimal_unscaled"),
      new ExpressionInfo(classOf[graft.functions.DecimalUnscaled].getName, "decimal_unscaled"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "decimal_unscaled takes 1 argument")
        graft.functions.DecimalUnscaled(children(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_build"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_build"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "bloom_filter_build takes (hash, estItems, numBits)")
        new BloomFilterAggregate(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_filter_contains"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "bloom_filter_contains takes (filter, hash)")
        BloomFilterMightContain(children(0), children(1))
      }))
  }
}
