package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid cell assignment as a native codegen expression — the
  * map-side kernel of the IVF and SemDeDup paths. Per row this is
  * nCentroids × dims of tight integer arithmetic over the whole corpus;
  * the prior UDF form paid catalyst↔scala row conversion and Seq boxing
  * per call, while this expression stays inside whole-stage codegen and
  * reads the unsafe array directly (the centroid matrix rides along as a
  * codegen reference object — no broadcast, no join).
  *
  * Semantics identical to the UDF it replaces: argmin of squared L2 over
  * quantized vectors, ties to the lowest cell id (strict < against the
  * running best); the early exit (`d < bestD`) only skips additions that
  * could not change the comparison. A null embedding or a length mismatch
  * fails fast with a clear message, never an NPE/AIOOBE mid-job.
  */
object CellAssign {

  /** Codegen entry point. `cents` is the quantized centroid matrix.
    * Null ELEMENTS fail loudly up front (getLong on an unsafe array's null
    * slot silently reads 0 — a wrong cell, not an error; the ArrayMath
    * kernels' per-element isNullAt precedent, hoisted out of the hot loop
    * since any null is fatal here rather than null-propagating).
    *
    * Magnitude contract: the squared-L2 accumulation is raw Long
    * arithmetic with no overflow guard — safe by construction under the
    * quantization contract (unit-norm embeddings at scale=1000 give
    * components ≤ ~1000, so the d-term sum stays < 2^31 even at 4096
    * dims), but caller-supplied values must keep |component difference|
    * below ~2^27 for 64 dims (generally sqrt(2^63 / dims)); beyond that
    * the sum wraps silently and returns a WRONG cell rather than failing.
    * Validate magnitudes upstream if feeding unquantized user data.
    */
  def assign(v: ArrayData, cents: Array[Array[Long]]): Int = {
    val dims = cents(0).length
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"cell assignment: embedding length ${v.numElements()} != centroid dimension $dims")
    var j = 0
    while (j < dims) {
      if (v.isNullAt(j)) throw new IllegalArgumentException(
        "cell assignment: null embedding element — filter null vectors before similarity search")
      j += 1
    }
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var d = 0L
      var k = 0
      while (k < dims && d < bestD) { val t = v.getLong(k) - c(k); d += t * t; k += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Column API: cell id (int) of the nearest centroid. */
  def assignCol(qv: Column, centroidsQ: Seq[Seq[Long]]): Column = {
    require(centroidsQ.nonEmpty, "centroid list must be non-empty")
    val dims = centroidsQ.head.length
    require(centroidsQ.forall(_.length == dims),
      s"all centroids must have the same dimension, got lengths " +
        centroidsQ.map(_.length).distinct.mkString(", "))
    GraftColumnBridge.column(CellAssignExpr(GraftColumnBridge.expression(qv), centroidsQ))
  }
}

/** `centroidsQ` stays a Seq so case-class equality is by VALUE — an Array
  * field would compare by reference and two logically identical
  * assignments would never be semanticEqual (defeating subexpression
  * elimination and plan reuse). The primitive matrix is derived lazily for
  * the kernel/codegen reference object.
  */
case class CellAssignExpr(child: Expression, centroidsQ: Seq[Seq[Long]])
    extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Long]] =
    centroidsQ.map(_.toArray).toArray

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cell_assign"

  // a null embedding must FAIL (filter nulls before similarity search),
  // not null-propagate into a silently unassigned row
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new IllegalArgumentException(
      "cell assignment: null embedding — filter null vectors before similarity search")
    CellAssign.assign(v.asInstanceOf[ArrayData], cents)
  }

  override def checkInputDataTypes(): TypeCheckResult = InputCheck.require(
    child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    },
    s"cell_assign requires an array<bigint> input, got ${child.dataType.catalogString}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    val c = child.genCode(ctx)
    val assignCall =
      s"graft.functions.CellAssign.assign(${c.value}, $centsRef)"
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      if (${c.isNull}) {
        throw new IllegalArgumentException(
          "cell assignment: null embedding — filter null vectors before similarity search");
      }
      int ${ev.value} = $assignCall;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
