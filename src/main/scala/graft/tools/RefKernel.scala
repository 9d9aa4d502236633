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

  /** First three fields of /proc/loadavg ("1m 5m 15m"), or "?" where
    * unavailable. Rides the bench artifacts next to the kernels so a
    * cross-round read can see ambient parallel load directly.
    */
  def loadAvg(): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Exception => "?" }

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

  /** All-cores variant: one FNV-1a worker per available processor, each
    * over its own thread-local buffer, min-of-3, reported as AGGREGATE
    * MB/s across workers. The single-thread kernel samples one core's
    * speed and is blind to multi-core contention — the r18 artifacts
    * show a 25% suite-wall gap on identical code at "coherent"
    * single-thread kernels (112.83 vs 141.51 s). The suite runs
    * local[32]; this kernel degrades exactly when the suite would.
    */
  def mbPerSecParallel(): Double = {
    val n = Runtime.getRuntime.availableProcessors()
    val passes = 8
    val bufLen = 8 * 1024 * 1024
    // allocate outside the timed region so the trial measures compute,
    // not first-touch page faults
    val bufs = Array.fill(n)(new Array[Byte](bufLen))
    bufs.foreach(java.util.Arrays.fill(_, 0x5a.toByte))
    val best = (0 until 3).map { _ =>
      val latch = new java.util.concurrent.CountDownLatch(n)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until n).map { w =>
        val t = new Thread(() => {
          val buf = bufs(w)
          start.await()
          var p = 0
          var h = -3750763034362895579L
          while (p < passes) {
            var i = 0
            while (i < buf.length) {
              h = (h ^ (buf(i) & 0xffL)) * 1099511628211L
              i += 1
            }
            p += 1
          }
          sink ^= h
          latch.countDown()
        })
        t.setDaemon(true); t.start(); t
      }
      val t0 = System.nanoTime()
      start.countDown()
      latch.await()
      val sec = (System.nanoTime() - t0) / 1e9
      threads.foreach(_.join())
      sec
    }.min
    n.toDouble * passes * bufLen / 1e6 / best
  }
}
