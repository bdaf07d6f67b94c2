package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting word n-gram shingles of a text column — each output
  * row is one space-joined window of `n` consecutive words.
  *
  * Exactly equivalent to
  * `explode(transform(sequence(...), i => concat_ws(" ", slice(split(text, " "), i, n))))`
  * (split keeps trailing empty strings, Java `split(" ", -1)` semantics —
  * the DuckDB oracles depend on this), but streams windows instead of
  * allocating a slice array + joined string through four interpreted
  * higher-order/collection ops per window. Since windows of a space-split
  * string are substrings of the original, each shingle is a single substring
  * copy — no per-window array allocation at all.
  *
  * With `withPos = true` each row also carries the 0-based word index the
  * window starts at — the positional form span-level dedup needs (the
  * duplicated gram's position is what gets removed, not the gram itself).
  */
case class WordShinglesExpr(child: Expression, n: Int, withPos: Boolean = false)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.require(child.dataType == StringType,
      s"word_shingles requires a string input, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    if (withPos)
      StructType(Seq(StructField("pos", IntegerType), StructField("shingle", StringType)))
    else
      StructType(Seq(StructField("shingle", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val s = data.asInstanceOf[UTF8String].toString
    val starts = WordShingles.wordStarts(s)
    val words = starts.length // fields = delimiters + 1
    if (words < n) return Iterator.empty
    Iterator.range(0, words - n + 1).map { w =>
      // window of n fields = substring from field w's start to field
      // (w+n-1)'s end — identical bytes to concat_ws(" ", slice(...))
      val shingle = UTF8String.fromString(
        s.substring(starts(w), WordShingles.windowEnd(s, starts, w, n)))
      if (withPos) InternalRow(w, shingle) else InternalRow(shingle)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  /** Word-start offsets under split(" ", -1) semantics: fields between
    * single-space delimiters, empties (from doubled/trailing spaces) kept.
    * THE tokenization convention — shared by the shingle generator and the
    * bloom probe kernel ([[BloomBits.countContaminated]]) so the two can
    * never desynchronize on what a "word window" is.
    */
  private[functions] def wordStarts(s: String): Array[Int] = {
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = s.indexOf(' ')
    while (i >= 0) { starts += i + 1; i = s.indexOf(' ', i + 1) }
    starts.toArray
  }

  /** Exclusive end offset of the `n`-word window starting at field `w`. */
  private[functions] def windowEnd(s: String, starts: Array[Int], w: Int, n: Int): Int =
    if (w + n < starts.length) starts(w + n) - 1 else s.length

  /** Column API: select(wordShingles(col, n)) yields rows (shingle). */
  def wordShingles(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShinglesExpr(GraftColumnBridge.expression(c), n))

  /** Column API: select(wordShinglesWithPos(col, n)) yields rows
    * (pos, shingle) — pos = 0-based index of the window's first word.
    */
  def wordShinglesWithPos(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShinglesExpr(GraftColumnBridge.expression(c), n, withPos = true))
}
