package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — the mergeable bounded-state summary that
  * finds frequent-item CANDIDATES in one pass with at most `k` counters per
  * partial aggregate, regardless of vocabulary size.
  *
  * Guarantee (Misra-Gries '82; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS '12): after any sequence of updates and merges over N
  * total items, every item with true frequency > N/(k+1) is present in the
  * summary, and each retained counter lower-bounds the true count by at
  * most N/(k+1). The candidate SET depends on merge order (so it is not
  * oracle-hashable by itself); callers get a deterministic answer by
  * re-counting the candidates exactly and thresholding — see
  * `TextStats.heavyHitters`, whose output provably equals the exact
  * GROUP-BY-HAVING answer because no true heavy hitter can be missing from
  * the candidate set.
  *
  * Scale shape: this is the map-side-combine story for heavy hitters at
  * 100 TB — the full (token, count) aggregate shuffles a vocabulary-sized
  * table, while this sketch ships exactly ≤ k counters per partition into
  * one final merge. State is O(k); update is O(1) amortized (the
  * decrement-all step charges each stored counter once per eviction wave).
  */
case class MisraGriesAggExpr(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries requires k >= 1: $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf(t) = c + 1L
        case None if buf.size < k => buf(t) = 1L
        case None =>
          // classic decrement-all eviction wave: every stored counter pays
          // one, zeros leave; the arriving item is NOT stored
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1L
            if (c == 0L) dead += key else buf(key) = c
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf(t) = buf.getOrElse(t, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop non-positive:
      // at most k counters are strictly greater than it, so <= k survive
      val vs = buf.values.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(vs.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0L) dead += key else buf(key) = c
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // token-sorted for a stable layout; counts are LOWER BOUNDS
    val rows = buf.toSeq.sortBy(_._1).map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
    // UTFDataFormatException past 65535 encoded bytes, which would kill the
    // aggregate mid-shuffle on a pathological corpus token
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("lower", LongType))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAggExpr =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Aggregate column: ≤ `k` (token, lower-bound-count) candidate structs,
    * token-sorted. Every item with true frequency > N/(k+1) is guaranteed
    * present; see [[MisraGriesAggExpr]].
    */
  def sketch(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAggExpr(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
