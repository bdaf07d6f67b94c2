package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The driver-side bounded-store pin must be an EXECUTABLE invariant: a
  * store that outgrew its windows-x-event-types bound (e.g. a merge keying
  * bug degrading the upsert to append-only history) fails loudly before the
  * collect, never silently becomes a data-sized driver pull.
  */
class StreamingGuardSpec extends AnyFunSuite {

  test("pinBoundedStore trips on an oversized store and pins a bounded one") {
    val spark = graft.TestSpark.spark
    val big = spark.range(100).toDF("x")
    val e = intercept[IllegalArgumentException] {
      StreamingQueries.pinBoundedStore(spark, big, cap = 10, what = "spec")
    }
    assert(e.getMessage.contains("beyond the bounded-summary cap"))
    // within the cap: pinned row-for-row with the schema intact
    val ok = StreamingQueries.pinBoundedStore(spark, big, cap = 100, what = "spec")
    assert(ok.count() == 100 && ok.columns.toSeq == Seq("x"))
  }
}
