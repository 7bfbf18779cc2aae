package graft.ops

/** Ambient-IO probe — write+fsync+read a 256 MB scratch file, return
  * MB moved per second. The box-health instrument behind Bench's
  * `ambient_io_probe` column and the throughput tools' per-run probe
  * points: cross-window wall-clock numbers are only comparable at
  * similar probe rates (BASELINE.md round-13 rule).
  */
object IoProbe {
  def mbps(): Double = {
    val mb = 256
    val buf = new Array[Byte](1 << 20)
    java.util.Arrays.fill(buf, 0x5a.toByte)
    val p = java.nio.file.Files.createTempFile("graft_io_probe", ".bin")
    try {
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        var i = 0
        while (i < mb) { ch.write(java.nio.ByteBuffer.wrap(buf)); i += 1 }
        ch.force(false)
      } finally ch.close()
      val in = java.nio.file.Files.newInputStream(p)
      try { while (in.read(buf) != -1) () } finally in.close()
      val sec = (System.nanoTime() - t0) / 1e9
      2.0 * mb / sec // MB moved (write + read) per second
    } finally java.nio.file.Files.deleteIfExists(p)
  }
}
