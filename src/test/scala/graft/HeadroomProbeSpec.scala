package graft

import org.scalatest.funsuite.AnyFunSuite

/** The headroom amplifier's contract: N× rows, referential integrity
  * preserved across offset keys, per-copy distinct entity names, fixed
  * catalog dims — measured on a 3× amplification of sf0.001.
  */
class HeadroomProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HeadroomProbe: 3x amplification keeps RI, distinct names, fixed dims") {
    val dest = graft.ops.Scratch.dir("headroom-spec").toString
    // main() builds its own session; getOrCreate inside reuses ours
    HeadroomProbe.main(Array("/root/testdata/sf0.001", dest, "3"))
    def rd(n: String) = spark.read.parquet(s"$dest/$n.parquet")
    def src(n: String) = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
    // scaled tables: exactly 3x rows
    for (t <- Seq("customer", "orders", "lineitem", "part", "supplier",
        "events", "documents", "embeddings"))
      assert(rd(t).count() == 3 * src(t).count(), s"$t not 3x")
    // catalog dims unscaled
    for (t <- Seq("nation", "region"))
      assert(rd(t).count() == src(t).count(), s"$t should not scale")
    // referential integrity: every FK resolves after offsetting
    import org.apache.spark.sql.functions._
    assert(rd("orders").join(rd("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0,
      "orders.o_custkey broken")
    assert(rd("lineitem").join(rd("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0,
      "lineitem.l_orderkey broken")
    assert(rd("lineitem").join(rd("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count() == 0,
      "lineitem.l_partkey broken")
    assert(rd("lineitem").join(rd("supplier"),
      col("l_suppkey") === col("s_suppkey"), "left_anti").count() == 0,
      "lineitem.l_suppkey broken")
    // keys stay unique (offset shards are disjoint)
    assert(rd("customer").select("c_custkey").distinct().count()
      == rd("customer").count(), "c_custkey collided")
    assert(rd("orders").select("o_orderkey").distinct().count()
      == rd("orders").count(), "o_orderkey collided")
    // entity names are per-copy DISTINCT (a 3x corpus has 3x entities,
    // not 3 byte-identical copies of each — the ER-blocking honesty rule)
    assert(rd("customer").select("c_name").distinct().count()
      == 3 * src("customer").select("c_name").distinct().count(),
      "c_name copies not distinct")
    // doc text: copy 0 byte-identical to the source, other copies perturbed
    val origTexts = src("documents").select("text").distinct().count()
    val ampTexts = rd("documents").select("text").distinct().count()
    assert(ampTexts == 3 * origTexts, s"expected 3x distinct texts, got $ampTexts vs $origTexts")
  }
}
