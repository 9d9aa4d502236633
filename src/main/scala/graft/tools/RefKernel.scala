package graft.tools

/** Fixed reference kernel: a single-threaded FNV-1a pass over a heap
  * buffer (192 MB of byte mixes, min-of-3). The kernel is the same work
  * every run on every host, so its MB/s measures the BOX at this moment
  * — this host swings 2-8x on identical code within hours (SCALE_NOTES
  * r16), which defeats round-over-round reads of raw seconds. Bench and
  * ThroughputBench sample it around their timed work and publish the
  * readings next to the raw numbers; compare runs whose kernel readings
  * agree within ~20%, or compare the normalized forms.
  */
object RefKernel {

  @volatile private var sink = 0L

  def mbPerSec(): Double = {
    val buf = new Array[Byte](8 * 1024 * 1024)
    java.util.Arrays.fill(buf, 0x5a.toByte)
    val passes = 24
    val best = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      var p = 0
      while (p < passes) {
        var i = 0
        var h = -3750763034362895579L // FNV-1a 64 offset basis
        while (i < buf.length) {
          h = (h ^ (buf(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        sink ^= h
        p += 1
      }
      (System.nanoTime() - t0) / 1e9
    }.min
    passes.toDouble * buf.length / 1e6 / best
  }
}
