package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.VTupleFunction)
  }
}

object GraftExtensions {
  private[functions] val VTupleFunction = (
    new FunctionIdentifier("vtuple_parse"),
    new ExpressionInfo(classOf[VTupleParseExpr].getName, "vtuple_parse"),
    (exprs: Seq[Expression]) => VTupleParseExpr(exprs.head): Expression)

  /** Register the engine functions on an ALREADY-RUNNING session (extensions
    * only apply at session construction; a same-JVM getOrCreate reuses the
    * existing session and silently skips them).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      VTupleFunction._1, VTupleFunction._2, VTupleFunction._3)
}
