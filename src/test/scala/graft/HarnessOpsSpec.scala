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

  test("SessionConf rejects a concurrent second scope on the same session") {
    graft.ops.SessionConf.withShufflePartitions(spark, 7) {
      val e = intercept[IllegalArgumentException] {
        graft.ops.SessionConf.withShufflePartitions(spark, 5)(())
      }
      assert(e.getMessage.contains("already active"))
    }
    // the outer scope's exit must clear the latch — a fresh scope works
    graft.ops.SessionConf.withShufflePartitions(spark, 6)(())
  }

  test("SessionConf.scoped restores set keys and UNSETS previously-unset ones") {
    val known = "spark.sql.shuffle.partitions"
    val fresh = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val before = spark.conf.get(known)
    val freshBefore = spark.conf.getOption(fresh)
    graft.ops.SessionConf.scoped(spark, known -> "9", fresh -> "0") {
      assert(spark.conf.get(known) == "9" && spark.conf.get(fresh) == "0")
    }
    assert(spark.conf.get(known) == before)
    // a key the session never set must come back to its DEFAULT, not stick
    // at the scoped value (conf.unset, not set-to-remembered-string)
    assert(spark.conf.getOption(fresh) == freshBefore ||
      spark.conf.get(fresh) != "0")
  }

  test("SessionConf: a THROWING conf.set restores applied keys and releases the latch") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // spark.sql.warehouse.dir is static: setting it on a live session
    // throws INSIDE the set loop, after the first key already applied
    intercept[Exception] {
      graft.ops.SessionConf.scoped(spark,
        key -> "11", "spark.sql.warehouse.dir" -> "/tmp/nope")(())
    }
    assert(spark.conf.get(key) == before,
      "a key applied before the throwing set leaked")
    // the latch must be free — before the fix this session was permanently
    // locked out of every future scope
    graft.ops.SessionConf.withShufflePartitions(spark, 6)(())
  }

  test("parseY4m returns None (never throws) on a hostile oversized header") {
    // declared W·H overflows Int when multiplied by the plane count; the
    // frame walk must reject it as undecodable, not throw on copyOfRange
    val hostile = ("YUV4MPEG2 W2000000000 H2000000000 C444\nFRAME\n" + "x" * 64)
      .getBytes("ISO-8859-1")
    assert(graft.llm.Multimodal.parseY4m(hostile).isEmpty)
    // and the decode path emits the sentinel row under the same bytes
    import spark.implicits._
    val media = spark.createDataset(Seq(graft.llm.Multimodal.MediaRow(
      1L, "video", "video/x-y4m", hostile, -1, -1, 0L)))
    val rows = graft.llm.Multimodal.decodeY4mFrames(media).collect()
    assert(rows.length == 1 && !rows(0).decoded && rows(0).frame_idx == -1)
  }

  test("Scratch.dir allocations live under a lock-marked per-JVM root") {
    val a = graft.ops.Scratch.dir("graft-spec")
    try {
      val root = a.getParent
      assert(root.getFileName.toString.startsWith("graft-jvm-"))
      assert(java.nio.file.Files.isRegularFile(root.resolve(".lock")),
        "liveness lock file missing — the stale sweep would never reclaim this root")
      // the lock must be STRONGLY HELD, not just created: an unreferenced
      // FileChannel is closed by GC, which releases its lock and makes the
      // LIVE root deletable by a sibling JVM's startup sweep (observed as
      // mid-run staged-dir loss). System.gc() makes the regression's
      // dominant path likely enough to catch here.
      System.gc(); Thread.sleep(50); System.gc()
      assert(graft.ops.Scratch.lockHeld,
        "scratch-root liveness lock not held after GC — sibling sweeps " +
          "can reclaim a LIVE root")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(a.toFile)
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
