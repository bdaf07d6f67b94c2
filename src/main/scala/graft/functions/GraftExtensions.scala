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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.All.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, clazz: Class[_],
                 builder: Seq[Expression] => Expression): FunctionDescription =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()
  private def boolArg(e: Expression): Boolean =
    e.eval(null).asInstanceOf[Boolean]

  private[functions] val All: Seq[FunctionDescription] = Seq(
    fn("vtuple_parse", classOf[VTupleParseExpr], es => VTupleParseExpr(es.head)),
    fn("dot_long", classOf[DotLongExpr], es => DotLongExpr(es(0), es(1))),
    fn("dot_double", classOf[DotDoubleExpr], es => DotDoubleExpr(es(0), es(1))),
    fn("ordered_pairs", classOf[OrderedPairsExpr], es => OrderedPairsExpr(es.head)),
    // generator args beyond the column must be foldable literals
    fn("word_shingles", classOf[WordShinglesExpr],
      es => WordShinglesExpr(es(0), intArg(es(1)))),
    fn("char_ngrams", classOf[CharNgramsExpr],
      es => CharNgramsExpr(es(0), intArg(es(1)), intArg(es(2)), boolArg(es(3)))),
    fn("edge_ngrams", classOf[EdgeNgramsExpr],
      es => EdgeNgramsExpr(es(0), intArg(es(1)), intArg(es(2)))))

  /** Register the engine functions on an ALREADY-RUNNING session (extensions
    * only apply at session construction; a same-JVM getOrCreate reuses the
    * existing session and silently skips them).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    All.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
