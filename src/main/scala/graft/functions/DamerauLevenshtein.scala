package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner '75): edit
  * distance whose operations are insert / delete / substitute / transpose
  * of two ADJACENT characters, with the transposed pair allowed to drift
  * apart through intermediate edits — so dl("CA","ABC") = 2, where the
  * restricted OSA variant (levenshtein + one-shot swaps) answers 3. This
  * matches DuckDB's `damerau_levenshtein`, making the two engines
  * INDEPENDENT implementations of the same function — the oracle property
  * the fuzzy-verify tier builds on.
  *
  * Computed over Unicode code points (not UTF-16 units), full (n+2)×(m+2)
  * DP with the per-alphabet last-occurrence row. O(n·m) time, O(n·m)
  * space — strictly a VERIFY-tier kernel: like the bounded levenshtein in
  * `Dedup.editVerify`, it must only ever run on capped candidate pairs
  * (LSH/prefix-filter output), never corpus × corpus. Scalar and
  * deterministic, so the expression is embarrassingly parallel;
  * CodegenFallback is fine off the codegen hot path at candidate-pair
  * volumes.
  */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.require(
      left.dataType == StringType && right.dataType == StringType,
      "damerau_levenshtein requires two string arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.distance(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "damerau_levenshtein"
}

object DamerauLevenshtein {

  /** Lowrance-Wagner DP on code-point arrays. */
  def distance(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2); row/col 0 hold the "infinity" sentinel frame
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // last row index (1-based) where each alphabet symbol occurred in a
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= n) {
      var db = 0 // last column in b (1-based) matching a(i-1) within this row
      j = 1
      while (j <= m) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftColumnBridge.column(DamerauLevenshteinExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
