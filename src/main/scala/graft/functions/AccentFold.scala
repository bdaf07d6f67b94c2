package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding for the `text_en` analyzer: NFD-decompose and strip
  * combining marks, so "café"/"cafe" and "naïve"/"naive" index to the same
  * token — the second half of the reference's ArangoSearch `text_en`
  * behavior (ArangoDbUtilities.java:305: lowercase + accent fold + stem)
  * alongside [[PorterStem]].
  *
  * Semantics match DuckDB's core `strip_accents` (also NFD + mark
  * removal — both leave non-decomposable letters like "ø" alone), which is
  * what lets the oracles mirror the fold exactly. ASCII input returns the
  * original string without allocating.
  */
case class AccentFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "accent_fold"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.require(child.dataType == StringType,
      s"accent_fold requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    AccentFold.foldUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AccentFold.foldUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AccentFold {

  /** NFD + strip combining marks. ASCII fast path returns the input.
    * ALL THREE mark categories go — Mn (non-spacing), Mc (spacing
    * combining, e.g. Devanagari vowel signs), Me (enclosing) — matching
    * utf8proc's STRIPMARK, which is what DuckDB's `strip_accents`
    * applies (verified empirically against all three categories).
    * Stripping Mn alone diverges from the oracle on Indic and
    * enclosing-mark text.
    */
  def fold(s: String): String = {
    if (s == null) return null
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) {
        val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(d.length)
        var j = 0
        while (j < d.length) {
          val c = d.charAt(j)
          val t = Character.getType(c)
          if (t != Character.NON_SPACING_MARK &&
              t != Character.COMBINING_SPACING_MARK &&
              t != Character.ENCLOSING_MARK) sb.append(c)
          j += 1
        }
        return sb.toString
      }
      i += 1
    }
    s
  }

  def foldUtf8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val folded = fold(str)
    if (folded eq str) s else UTF8String.fromString(folded)
  }

  def foldCol(c: Column): Column =
    GraftColumnBridge.column(AccentFoldExpr(GraftColumnBridge.expression(c)))
}
