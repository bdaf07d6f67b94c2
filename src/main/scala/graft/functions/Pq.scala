package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen kernels for product-quantization ANN (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * PQ splits a d-dim vector into M contiguous subvectors and stores only
  * the index of each subvector's nearest codeword — d longs compress to M
  * small ints, which is what lets a 100 TB embedding corpus live in
  * executor memory as codes. Search uses the ASYMMETRIC distance (ADC):
  * the query stays exact, and per corpus row the distance is M table
  * lookups into a per-query lookup table (LUT) instead of d multiplies.
  *
  *  - [[PqLutExpr]] runs ONCE PER QUERY row: lut[m*K + j] =
  *    ||q_sub_m − codeword(m, j)||² — K·d integer ops, negligible.
  *  - [[PqAdcExpr]] runs once per (query, corpus-code) pair — the hot
  *    kernel, a fused M-lookup loop inside whole-stage codegen.
  *
  * Both follow [[CellAssign]]'s fail-loud contract: a null vector, null
  * element, bad length, or out-of-range code throws with an actionable
  * message rather than silently scoring wrong (these arrays are produced
  * by the engine's own kernels; malformed input is always a caller bug).
  * All arithmetic is exact integer on quantized vectors, so scores
  * reproduce bit-for-bit on any engine — the property the DuckDB oracle
  * needs.
  */
object Pq {

  /** lut[m*K + j] = squared L2 between query subvector m and codeword j of
    * codebook m. `cb(m)(j)` is a codeword; all codebooks share K and sub.
    */
  def lut(qv: ArrayData, cb: Array[Array[Array[Long]]]): ArrayData = {
    val m = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    val d = qv.numElements()
    if (d != m * sub) throw new IllegalArgumentException(
      s"pq_lut: query dimension $d != numSubspaces $m * subDim $sub")
    // null scan hoisted out of the codeword loops (the CellAssign shape):
    // any null is fatal, so each element is checked ONCE, not K times
    var e = 0
    while (e < d) {
      if (qv.isNullAt(e)) throw new IllegalArgumentException(
        "pq_lut: null embedding element — filter null vectors before similarity search")
      e += 1
    }
    val out = new Array[Long](m * k)
    var mi = 0
    while (mi < m) {
      val base = mi * sub
      var j = 0
      while (j < k) {
        val c = cb(mi)(j)
        var s = 0L
        var i = 0
        while (i < sub) {
          val t = qv.getLong(base + i) - c(i)
          s += t * t
          i += 1
        }
        out(mi * k + j) = s
        j += 1
      }
      mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Residual kernel: out[i] = qv[i] − cents[cell][i], fail-loud on nulls,
    * dimension mismatch, or an out-of-range cell.
    */
  def residual(qv: ArrayData, cell: Int, cents: Array[Array[Long]]): ArrayData = {
    if (cell < 0 || cell >= cents.length) throw new IllegalArgumentException(
      s"cell_residual: cell $cell out of range [0, ${cents.length})")
    val c = cents(cell)
    val d = qv.numElements()
    if (d != c.length) throw new IllegalArgumentException(
      s"cell_residual: vector dimension $d != centroid dimension ${c.length}")
    val out = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (qv.isNullAt(i)) throw new IllegalArgumentException(
        "cell_residual: null vector element — filter null vectors before similarity search")
      out(i) = qv.getLong(i) - c(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC score: Σ_m lut[m*K + codes[m]]. */
  def adc(lut: ArrayData, codes: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    if (lut.numElements() != m * k) throw new IllegalArgumentException(
      s"pq_adc: LUT length ${lut.numElements()} != numSubspaces $m * numCodewords $k " +
        "(query LUT and corpus codes built from different codebooks?)")
    var s = 0L
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) throw new IllegalArgumentException(
        "pq_adc: null code element — codes must come from pqEncode")
      val c = codes.getInt(mi)
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"pq_adc: code $c out of range [0, $k) in subspace $mi")
      s += lut.getLong(mi * k + c)
      mi += 1
    }
    s
  }

  /** Column API: per-query ADC lookup table (array<long> of M*K entries). */
  def lutCol(qv: Column, codebooks: Seq[Seq[Seq[Long]]]): Column = {
    validateCodebooks(codebooks)
    GraftColumnBridge.column(PqLutExpr(GraftColumnBridge.expression(qv), codebooks))
  }

  /** Column API: residual vs a coarse centroid — `qv - centroids[cell]`,
    * the IVF-PQ encode/search input (PQ codebooks live in residual space,
    * where vectors cluster around the origin and codewords spend their
    * precision on the fine structure instead of the cell offset).
    */
  def residualCol(qv: Column, cell: Column, centroidsQ: Seq[Seq[Long]]): Column = {
    require(centroidsQ.nonEmpty, "centroid list must be non-empty")
    val dims = centroidsQ.head.length
    require(centroidsQ.forall(_.length == dims),
      "all centroids must have the same dimension")
    GraftColumnBridge.column(CellResidualExpr(
      GraftColumnBridge.expression(qv), GraftColumnBridge.expression(cell), centroidsQ))
  }

  /** Column API: ADC distance from a query LUT and a corpus code array. */
  def adcCol(lut: Column, codes: Column, numCodewords: Int): Column = {
    require(numCodewords >= 1, s"numCodewords must be >= 1: got $numCodewords")
    GraftColumnBridge.column(PqAdcExpr(
      GraftColumnBridge.expression(lut), GraftColumnBridge.expression(codes), numCodewords))
  }

  private[graft] def validateCodebooks(cb: Seq[Seq[Seq[Long]]]): Unit = {
    require(cb.nonEmpty && cb.head.nonEmpty, "codebooks must be non-empty")
    val k = cb.head.length
    val sub = cb.head.head.length
    require(sub >= 1, "codewords must be non-empty")
    require(cb.forall(_.length == k),
      s"all codebooks must have the same codeword count, got " +
        cb.map(_.length).distinct.mkString(", "))
    require(cb.forall(_.forall(_.length == sub)),
      s"all codewords must have the same dimension, got " +
        cb.flatMap(_.map(_.length)).distinct.mkString(", "))
  }
}

/** Codebooks stay Seq-of-Seq for VALUE equality (the [[CellAssignExpr]]
  * lesson: an Array field compares by reference and defeats subexpression
  * elimination); the primitive matrix is derived lazily for the kernel.
  */
case class PqLutExpr(child: Expression, codebooks: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = InputCheck.require(
    child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    },
    s"pq_lut requires an array<bigint> input, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new IllegalArgumentException(
      "pq_lut: null embedding — filter null vectors before similarity search")
    Pq.lut(v.asInstanceOf[ArrayData], cb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "long[][][]")
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      if (${c.isNull}) {
        throw new IllegalArgumentException(
          "pq_lut: null embedding — filter null vectors before similarity search");
      }
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.Pq.lut(${c.value}, $cbRef);""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual vs the row's assigned coarse centroid: out[i] = qv[i] −
  * centroids[cell][i]. Same fail-loud contract and Seq-for-value-equality
  * shape as [[CellAssignExpr]]; runs once per corpus row at IVF-PQ encode
  * and once per (query, probed cell) at search.
  */
case class CellResidualExpr(left: Expression, right: Expression, centroidsQ: Seq[Seq[Long]])
    extends BinaryExpression {

  @transient private lazy val cents: Array[Array[Long]] =
    centroidsQ.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cell_residual"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = InputCheck.require(
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => true
      case _ => false
    },
    s"cell_residual requires (array<bigint> vector, int cell), got " +
      s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    val c = right.eval(input)
    if (v == null || c == null) throw new IllegalArgumentException(
      "cell_residual: null vector or cell — filter nulls before similarity search")
    Pq.residual(v.asInstanceOf[ArrayData], c.asInstanceOf[Int], cents)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val centsRef = ctx.addReferenceObj("residCents", cents, "long[][]")
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${l.code}
      ${r.code}
      if (${l.isNull} || ${r.isNull}) {
        throw new IllegalArgumentException(
          "cell_residual: null vector or cell — filter nulls before similarity search");
      }
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.Pq.residual(${l.value}, ${r.value}, $centsRef);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class PqAdcExpr(left: Expression, right: Expression, numCodewords: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = InputCheck.require(
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) => true
      case _ => false
    },
    s"pq_adc requires (array<bigint> lut, array<int> codes), got " +
      s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) throw new IllegalArgumentException(
      "pq_adc: null LUT or code array — both come from the engine's own kernels")
    Pq.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], numCodewords)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${l.code}
      ${r.code}
      if (${l.isNull} || ${r.isNull}) {
        throw new IllegalArgumentException(
          "pq_adc: null LUT or code array — both come from the engine's own kernels");
      }
      long ${ev.value} = graft.functions.Pq.adc(${l.value}, ${r.value}, $numCodewords);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
