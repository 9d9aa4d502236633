package graft.operators

import graft.SparkSpec
import graft.operators.MetricsExport._

/** Metrics exporter contracts: prometheus text exposition, statsd
  * datagram format + delta semantics, influx line rendering, the real
  * UDP path, and the config `metrics:` block.
  */
class MetricsExportSpec extends SparkSpec {

  test("prometheus exposition: TYPE headers, label escaping, summaries") {
    val r = new Registry
    r.counter("msgs_total").addAndGet(7)
    r.counter("msgs_total", Seq("path" -> "a\"b\n")).addAndGet(2)
    r.gaugeSet("lag", 3.5)
    r.timing("latency", 2000000L) // 2ms
    r.timing("latency", 4000000L)
    val text = prometheusText(r)
    assert(text.contains("# TYPE msgs_total counter"))
    assert(text.contains("msgs_total 7"))
    assert(text.contains("""msgs_total{path="a\"b\n"} 2"""))
    assert(text.contains("# TYPE lag gauge"))
    assert(text.contains("lag 3.5"))
    assert(text.contains("# TYPE latency summary"))
    assert(text.contains("latency_count 2"))
    assert(text.contains("latency_sum 0.006"))
    // invalid chars sanitize to underscores
    val r2 = new Registry
    r2.counter("a.b-c").addAndGet(1)
    assert(prometheusText(r2).contains("a_b_c 1"))
  }

  test("statsd flush: counters as deltas, gauges absolute, timings as ms means") {
    val r = new Registry
    r.counter("in").addAndGet(10)
    r.gaugeSet("depth", 4)
    r.timing("t", 6000000L)
    val f = new StatsdFlusher(r, prefix = "app.")
    assert(f.flushLines().toSet == Set("app.in:10|c", "app.depth:4|g",
      "app.t:6|ms"))
    // second flush: counter unchanged → no delta line; gauge re-sent
    assert(f.flushLines().toSet == Set("app.depth:4|g", "app.t:6|ms"))
    r.counter("in").addAndGet(5)
    assert(f.flushLines().contains("app.in:5|c"))
    // datadog-style tag suffix
    val r3 = new Registry
    r3.counter("x", Seq("k" -> "v", "z" -> "1")).addAndGet(1)
    assert(new StatsdFlusher(r3).flushLines() == Seq("x:1|c|#k:v,z:1"))
  }

  test("statsd UDP: real datagrams arrive on a loopback socket") {
    val sock = new java.net.DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    sock.setSoTimeout(5000)
    try {
      statsdSend(s"127.0.0.1:${sock.getLocalPort}",
        Seq("a:1|c", "b:2|g"))
      val buf = new Array[Byte](2048)
      val pkt = new java.net.DatagramPacket(buf, buf.length)
      sock.receive(pkt)
      val got = new String(pkt.getData, 0, pkt.getLength, "UTF-8")
      assert(got == "a:1|c\nb:2|g", "multi-metric packet, newline-joined")
    } finally sock.close()
  }

  test("influx lines: tags from labels, typed value field, shared timestamp") {
    val r = new Registry
    r.counter("reqs", Seq("route" -> "a b")).addAndGet(3)
    r.gaugeSet("temp", 21.5)
    r.timing("lat", 8000000L)
    val lines = influxLines(r, 1700000000000000000L)
    assert(lines.contains("""reqs,route=a\ b value=3i 1700000000000000000"""))
    assert(lines.contains("temp value=21.5 1700000000000000000"))
    assert(lines.exists(_.startsWith("lat count=1i,mean=8000000.0")))
    // push lands in the shared ILP mem endpoint (format parity with
    // the questdb service's independent decoder)
    val name = "minf_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val svc = graft.sinks.QuestDb.named(name)
    influxPush(r, s"mem://$name", 1700000000000000000L)
    assert(svc.rows("temp").head._1("value") == 21.5)
    assert(svc.rows("reqs").head._1 == Map("route" -> "a b", "value" -> 3L))
    graft.sinks.QuestDb.drop(name)
  }

  test("config metrics block: observed row count flushes to statsd without a second job") {
    val name = "mstat_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val config =
      s"""input:
         |  generate: { count: 5, mapping: 'root.id = this.seq' }
         |metrics:
         |  statsd:
         |    address: "mem://$name"
         |    prefix: graft
         |output:
         |  memory: { name: metrics_probe_out }
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    val lines = MetricsExport.memSink(name).toArray.map(_.toString).toSet
    assert(lines.contains("graft.output_sent:5|c"), s"got $lines")
    MetricsExport.dropMemSink(name)
  }
}
