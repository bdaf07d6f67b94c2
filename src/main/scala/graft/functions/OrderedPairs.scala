package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Generator emitting every ordered pair (i < j) of an array's elements as a
  * (left, right) row — the candidate-pair fan-out primitive of the dedup
  * operators.
  *
  * The composable form — `explode(flatten(transform(a, (x,i) =>
  * transform(slice(a, i+2, size(a)), y => struct(x, y)))))` — MATERIALIZES
  * the full O(n²) pair array per input row before exploding: a posting list
  * of 100k duplicate ids would allocate 5·10⁹ structs in one task. This
  * generator streams pairs one at a time (constant memory per input row),
  * which is what makes unbounded posting lists survivable even before the
  * maxDF/maxBucket caps kick in. It also skips the per-pair lambda-dispatch
  * chain of the nested higher-order functions.
  */
case class OrderedPairsExpr(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.require(child.dataType.isInstanceOf[ArrayType],
      s"ordered_pairs requires an array input, got ${child.dataType.catalogString}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("left", elType), StructField("right", elType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val r = InternalRow(arr.get(i, elType), arr.get(j, elType))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrderedPairs {
  /** Column API: select(orderedPairs(col)) yields rows (left, right). */
  def orderedPairs(c: Column): Column =
    GraftColumnBridge.column(OrderedPairsExpr(GraftColumnBridge.expression(c)))
}
