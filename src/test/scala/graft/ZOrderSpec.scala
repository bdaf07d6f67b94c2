package graft

import graft.ops.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton-key correctness against a bit-twiddling reference, the
  * out-of-range executable invariant, and the property the layout exists
  * for: range-partitioning on z bounds every file's extent in BOTH
  * dimensions, where a single-column sort leaves the other dimension
  * unpruned.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the driver-side bit-interleave reference on random inputs") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got = rows.toDF("id", "x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), bits = 20))
      .select("id", "z").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, x, y) =>
      assert(got(id) == zRef(x, y, 20), s"id=$id x=$x y=$y")
    }
    // boundary values at full width
    val edge = Seq((1L, 0L, 0L), (2L, (1L << 31) - 1, 0L), (3L, 0L, (1L << 31) - 1),
      (4L, (1L << 31) - 1, (1L << 31) - 1)).toDF("id", "x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), bits = 31))
      .select("id", "z").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge(1L) == 0L)
    assert(edge(4L) == zRef((1L << 31) - 1, (1L << 31) - 1, 31))
    assert((edge(2L) & edge(3L)) == 0L) // x-bits and y-bits are disjoint lanes
    assert((edge(2L) | edge(3L)) == edge(4L)) // and together they fill the key
  }

  test("zValue refuses out-of-range inputs loudly instead of folding distant keys") {
    val bad = Seq((1L, 1L << 10, 0L)).toDF("id", "x", "y")
    intercept[Exception] {
      bad.withColumn("z", ZOrder.zValue(col("x"), col("y"), bits = 10))
        .select("z").collect()
    }
    intercept[IllegalArgumentException](ZOrder.zValue(col("x"), col("y"), bits = 32))
  }

  test("layoutByZ bounds every partition in both dimensions; x-sort does not") {
    // uniform 64x64 grid, 16 range partitions: contiguous z-ranges cover
    // quadtree cells, so each partition's extent stays a fraction of the
    // domain in BOTH x and y. The same data range-partitioned on x alone
    // leaves y unbounded (full 0..63 in every partition) — the layout
    // makes the second dimension prunable, the single-column sort cannot.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val zBoxes = ZOrder.layoutByZ(grid, "x", "y", bits = 6, numFiles = 16)
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p").agg(
        (max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(zBoxes.length >= 8) // sampling may merge a few ranges, not most
    zBoxes.foreach { case (xr, yr) =>
      assert(xr <= 56 && yr <= 56, s"z-partition extent ($xr, $yr) not bounded")
    }
    val xSorted = grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p").agg((max("y") - min("y")).as("yr"))
      .collect().map(_.getLong(1))
    assert(xSorted.forall(_ == 63L)) // every x-strip spans the full y domain
  }
}
