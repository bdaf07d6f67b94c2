package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash signature as ONE native mergeable aggregate — the map-combining
  * replacement for the two-aggregation interpreted form in
  * [[graft.llm.Dedup.simhash]]'s original plan (per-(id, token) weight
  * groupBy, then `bits` separate SUM expressions each re-extracting a hex
  * digit of the token md5 with an instr/floor chain).
  *
  * Buffer = `bits` running longs, one per signature bit: each token
  * occurrence adds +1 where its hash bit is set, −1 where clear — summing
  * per-occurrence ±1 equals the weighted form (weight = term count) by
  * linearity, so the first groupBy disappears entirely. Partials merge by
  * element-wise addition (exact, order-free), and the final signature sets
  * bit b iff the accumulated sum is positive — identical semantics, bit
  * for bit, to the interpreted chain and to the DuckDB oracle replay.
  *
  * Bit definition (shared with the oracle): bit b of a token = bit
  * (b mod 4) of hex digit (b div 4) of md5(token) — i.e. nibble b/4 of the
  * digest, high nibble of each byte first.
  *
  * Scale shape: ONE aggregation over exploded tokens, combining map-side
  * to a `bits`-long vector per document before the shuffle; the md5 runs
  * once per occurrence (digest reused per buffer) instead of once per
  * (distinct token × bit) expression evaluation.
  */
case class SimHashAggExpr(child: Expression, bits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 4 && bits <= 64 && bits % 4 == 0,
    s"simhash_agg requires bits in 4..64, multiple of 4: $bits")

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      md.reset()
      val digest = md.digest(v.asInstanceOf[UTF8String].getBytes)
      var b = 0
      while (b < bits) {
        // nibble b/4: even nibble index = high half of byte (hex chars
        // print high nibble first)
        val nIdx = b >> 2
        val byte = digest(nIdx >> 1) & 0xff
        val nibble = if ((nIdx & 1) == 0) byte >> 4 else byte & 0xf
        buf(b) += (if (((nibble >> (b & 3)) & 1) == 1) 1L else -1L)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0L) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bits * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bits) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bits)
    var i = 0
    while (i < bits) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): SimHashAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAggExpr =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  /** Aggregate column: the `bits`-bit SimHash signature (LONG) over the
    * grouped token occurrences. Feed RAW occurrences — duplicates ARE the
    * weights.
    */
  def simhash(token: Column, bits: Int): Column =
    GraftColumnBridge.column(
      SimHashAggExpr(GraftColumnBridge.expression(token), bits).toAggregateExpression())
}
