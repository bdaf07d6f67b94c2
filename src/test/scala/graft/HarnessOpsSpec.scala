package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two tiny harness primitives the round-11 entries lean on: the
  * scoped conf swap must restore on EVERY exit path (a throwing entry must
  * not poison the session's shuffle sizing for the rest of the battery),
  * and scratch dirs must be real, writable and unique.
  */
class HarnessOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SessionConf.withShufflePartitions restores the conf on success AND on throw") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val inside = graft.ops.SessionConf.withShufflePartitions(spark, 7) {
      spark.conf.get(key)
    }
    assert(inside == "7" && spark.conf.get(key) == before)
    intercept[RuntimeException] {
      graft.ops.SessionConf.withShufflePartitions(spark, 5) {
        throw new RuntimeException("entry failed mid-window")
      }
    }
    assert(spark.conf.get(key) == before, "conf leaked past a throwing body")
  }

  test("Scratch.dir yields distinct writable directories") {
    val a = graft.ops.Scratch.dir("graft-spec")
    val b = graft.ops.Scratch.dir("graft-spec")
    try {
      assert(a != b)
      assert(java.nio.file.Files.isDirectory(a) && java.nio.file.Files.isWritable(a))
      val f = a.resolve("probe")
      java.nio.file.Files.writeString(f, "x")
      assert(java.nio.file.Files.readString(f) == "x")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(a.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(b.toFile)
    }
  }
}
