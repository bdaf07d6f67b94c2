package graft.functions

import graft.model.VTuple
import graft.ops.UriOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hot-path URI → (term, id, number,
  * is_valid_vertex) parse (N2, reference: OntologyGraphBuilder.java:72-102).
  *
  * The UDF form (UriOps.vtupleUdf) pays a catalyst→Scala boundary per call
  * (UTF8String→String→Row→InternalRow conversions plus closure dispatch and
  * null-wrapping); this expression stays inside whole-stage codegen by
  * emitting a direct static call to [[VTupleParse.parse]], which builds the
  * InternalRow result directly. This is SURVEY §7.4's "promote to Expression
  * if hot" lever — the parse runs once per subject and object of every
  * triple in the graph build.
  */
case class VTupleParseExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VTupleParse.schema
  override def nullable: Boolean = false
  override def prettyName: String = "vtuple_parse"

  // Invalid/null URIs yield the (null,null,null,false) struct — the
  // reference's invalid VTuple — so null input must NOT short-circuit.
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    VTupleParse.parse(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = "graft.functions.VTupleParse"
    ev.copy(
      code = code"""
        ${childGen.code}
        InternalRow ${ev.value} = ${childGen.isNull}
          ? $helper.invalidRow()
          : $helper.parse(${childGen.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VTupleParse {

  val schema: StructType = StructType(Seq(
    StructField("term", StringType),
    StructField("id", StringType),
    StructField("number", StringType),
    StructField("isValidVertex", BooleanType, nullable = false)))

  /** Shared invalid result — (null, null, null, false). Exposed as a method
    * for generated-code access.
    */
  private val Invalid: InternalRow = InternalRow(null, null, null, false)
  def invalidRow(): InternalRow = Invalid

  /** Parse entry point, called from both interpreted eval and generated code. */
  def parse(uri: UTF8String): InternalRow = {
    if (uri == null) return Invalid
    val v: VTuple = UriOps.createVTuple(uri.toString)
    if (v.term == null) Invalid
    else InternalRow(
      UTF8String.fromString(v.term), UTF8String.fromString(v.id),
      UTF8String.fromString(v.number), v.isValidVertex)
  }

  /** Column API: vtuple(col) → struct(term, id, number, isValidVertex). */
  def vtuple(c: Column): Column =
    GraftColumnBridge.column(VTupleParseExpr(GraftColumnBridge.expression(c)))
}
