package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** Session extensions: registers the engine's native Catalyst
  * expressions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.FUNC_NAME),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.FUNC_NAME),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, s"${CosineSimilarity.FUNC_NAME} takes 2 arguments")
        CosineSimilarity(children(0), children(1))
      }))
  }
}
