package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition — the corpus-hygiene primitive that
  * makes "e + combining acute" and the precomposed "é" byte-identical
  * BEFORE any hash-based dedup, shingling, or tokenization sees the text.
  * Without it the same sentence captured by two crawlers lands in two
  * dedup classes and two vocabulary entries; at 100 TB that is a
  * systematic near-dup leak no similarity threshold recovers, because the
  * variants are byte-different but render identically.
  *
  * Complements [[AccentFold]] (NFD + strip marks, a LOSSY analyzer fold):
  * NFC is the lossless canonical form a corpus stores; folding happens at
  * index/query time. Semantics match DuckDB's `nfc_normalize` exactly
  * (both implement UAX #15 canonical composition), which is what lets the
  * oracle mirror the normalization.
  *
  * Runs in whole-stage codegen via a static call ([[PorterStem]]
  * precedent); the all-ASCII fast path (the overwhelming majority of a
  * web corpus) returns the original UTF8String without allocating —
  * `Normalizer.isNormalized` only runs on strings with high bytes.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.require(child.dataType == StringType,
      s"nfc_normalize requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfcUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfcUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-compose `s`. Returns the input object unchanged when it is
    * already normalized (ASCII included — every ASCII string is NFC).
    */
  def nfc(s: String): String = {
    if (s == null) return null
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** UTF8String adapter for codegen: ASCII scans without decoding; only
    * strings with high bytes pay the String round-trip.
    */
  def nfcUtf8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val out = nfc(s.toString)
        return if (out eq null) null else UTF8String.fromString(out)
      }
      i += 1
    }
    s
  }

  /** Column form. */
  def nfcCol(c: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(c)))
}
