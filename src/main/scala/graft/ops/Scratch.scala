package graft.ops

/** RAM-backed scratch space for test/bench harness mechanics (replay
  * staging, fixture pipeline outputs, checkpoint dirs): many-small-file IO
  * on a disk-backed tmpdir is pure fixed cost for entries whose measured
  * work is the operator, not the filesystem. Prefers /dev/shm when present
  * and writable, falling back to java.io.tmpdir. Callers own deletion —
  * same contract as Files.createTempDirectory.
  */
object Scratch {
  def dir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }
}
