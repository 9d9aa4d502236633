package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}

import scala.jdk.CollectionConverters._

/** Metrics exporters (§2.14): the reference exposes its metric
  * registry through pluggable targets — `prometheus`
  * (internal/impl/prometheus/metrics_prometheus.go: pull endpoint
  * text exposition + optional push-gateway), `statsd`
  * (internal/impl/statsd/metrics_statsd.go: UDP datagrams) and
  * `influxdb` (internal/impl/influxdb/metrics_influxdb.go: periodic
  * line-protocol pushes). Contract only, no code ported — the
  * renderers implement the PUBLIC wire formats directly:
  *
  *   - Prometheus text exposition v0.0.4: `# TYPE` headers, label
  *     escaping (`\\`, `\"`, `\n`), counter/gauge/summary families;
  *   - statsd datagrams: `name:value|c`, `|g`, `|ms` (one metric per
  *     line, multi-metric packets newline-joined);
  *   - InfluxDB line protocol via the shared ILP rules (tags = metric
  *     labels, `value` field, trailing nanos timestamp).
  *
  * The registry is process-wide and lock-free (ConcurrentHashMap +
  * adders) — kernels on executor threads can bump counters without
  * coordination; exporters snapshot on flush.
  */
object MetricsExport {

  type Labels = Seq[(String, String)]

  final case class TimingSummary(count: Long, sumNs: Long,
                                 minNs: Long, maxNs: Long)

  final class Registry {
    private[MetricsExport] val counters =
      new ConcurrentHashMap[(String, Labels), AtomicLong]()
    private[MetricsExport] val gauges =
      new ConcurrentHashMap[(String, Labels), DoubleAdder]()
    private[MetricsExport] val timerCount =
      new ConcurrentHashMap[(String, Labels), AtomicLong]()
    private[MetricsExport] val timerSum =
      new ConcurrentHashMap[(String, Labels), AtomicLong]()
    private[MetricsExport] val timerMin =
      new ConcurrentHashMap[(String, Labels), AtomicLong]()
    private[MetricsExport] val timerMax =
      new ConcurrentHashMap[(String, Labels), AtomicLong]()

    def counter(name: String, labels: Labels = Nil): AtomicLong =
      counters.computeIfAbsent((name, labels), _ => new AtomicLong())

    def gaugeSet(name: String, v: Double, labels: Labels = Nil): Unit = {
      val g = gauges.computeIfAbsent((name, labels), _ => new DoubleAdder())
      g.reset(); g.add(v)
    }

    def timing(name: String, ns: Long, labels: Labels = Nil): Unit = {
      timerCount.computeIfAbsent((name, labels), _ => new AtomicLong())
        .incrementAndGet()
      timerSum.computeIfAbsent((name, labels), _ => new AtomicLong())
        .addAndGet(ns)
      timerMin.computeIfAbsent((name, labels),
        _ => new AtomicLong(Long.MaxValue))
        .accumulateAndGet(ns, math.min(_, _))
      timerMax.computeIfAbsent((name, labels), _ => new AtomicLong())
        .accumulateAndGet(ns, math.max(_, _))
    }

    def counterValues: Map[(String, Labels), Long] =
      counters.asScala.map { case (k, v) => k -> v.get }.toMap
    def gaugeValues: Map[(String, Labels), Double] =
      gauges.asScala.map { case (k, v) => k -> v.sum }.toMap
    def timingValues: Map[(String, Labels), TimingSummary] =
      timerCount.asScala.keys.map { k =>
        k -> TimingSummary(timerCount.get(k).get, timerSum.get(k).get,
          timerMin.get(k).get, timerMax.get(k).get)
      }.toMap
  }

  /** The engine-wide default registry (the reference's global
    * metrics object handed to every component).
    */
  val global: Registry = new Registry

  // ---- prometheus text exposition (v0.0.4) ----

  private def promEscape(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def promLabels(labels: Labels): String =
    if (labels.isEmpty) ""
    else labels.map { case (k, v) => s"""$k="${promEscape(v)}"""" }
      .mkString("{", ",", "}")

  private def promName(name: String): String =
    name.replaceAll("[^a-zA-Z0-9_:]", "_")

  /** Render the registry in Prometheus text exposition format —
    * families grouped under one `# TYPE` header, timings as summaries
    * with `_count`/`_sum` (seconds, the prometheus base unit).
    */
  def prometheusText(r: Registry): String = {
    val sb = new StringBuilder
    r.counterValues.groupBy { case ((n, _), _) => n }.toSeq.sortBy(_._1)
      .foreach { case (name, series) =>
        val n = promName(name)
        sb.append(s"# TYPE $n counter\n")
        series.toSeq.sortBy(_._1._2.toString).foreach { case ((_, ls), v) =>
          sb.append(s"$n${promLabels(ls)} $v\n")
        }
      }
    r.gaugeValues.groupBy { case ((n, _), _) => n }.toSeq.sortBy(_._1)
      .foreach { case (name, series) =>
        val n = promName(name)
        sb.append(s"# TYPE $n gauge\n")
        series.toSeq.sortBy(_._1._2.toString).foreach { case ((_, ls), v) =>
          val rendered = if (v == v.toLong) v.toLong.toString else v.toString
          sb.append(s"$n${promLabels(ls)} $rendered\n")
        }
      }
    r.timingValues.groupBy { case ((n, _), _) => n }.toSeq.sortBy(_._1)
      .foreach { case (name, series) =>
        val n = promName(name)
        sb.append(s"# TYPE $n summary\n")
        series.toSeq.sortBy(_._1._2.toString).foreach { case ((_, ls), t) =>
          sb.append(s"${n}_count${promLabels(ls)} ${t.count}\n")
          sb.append(s"${n}_sum${promLabels(ls)} ${t.sumNs / 1e9}\n")
        }
      }
    sb.toString
  }

  // ---- json_api document ----

  /** The `json_api` metrics document (metrics/json_api.adoc): a flat
    * object of name{labels} → value, timings exposed as `_count` /
    * `_mean_ns` pairs — the reference's pull-endpoint payload shape.
    */
  def jsonApi(r: Registry): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val o = m.createObjectNode()
    def key(n: String, ls: Labels): String =
      if (ls.isEmpty) n
      else n + ls.map { case (k, v) => s"$k=$v" }.mkString("{", ",", "}")
    r.counterValues.toSeq.sortBy(_._1.toString).foreach {
      case ((n, ls), v) => o.put(key(n, ls), v)
    }
    r.gaugeValues.toSeq.sortBy(_._1.toString).foreach {
      case ((n, ls), v) => o.put(key(n, ls), v)
    }
    r.timingValues.toSeq.sortBy(_._1.toString).foreach {
      case ((n, ls), t) =>
        o.put(key(n + "_count", ls), t.count)
        o.put(key(n + "_mean_ns", ls),
          if (t.count == 0) 0L else t.sumNs / t.count)
    }
    o.toString
  }

  // ---- statsd datagrams ----

  /** One datagram line per metric: counters as deltas since the last
    * flush (statsd is increment-oriented), gauges absolute, timings as
    * `|ms`. Datadog-style `|#k:v` tag suffix when labels exist (the
    * widest-deployed statsd tag dialect).
    */
  final class StatsdFlusher(r: Registry, prefix: String = "") {
    private val lastCounts = new ConcurrentHashMap[(String, Labels), Long]()

    private def tag(ls: Labels): String =
      if (ls.isEmpty) ""
      else "|#" + ls.map { case (k, v) => s"$k:$v" }.mkString(",")

    def flushLines(): Seq[String] = {
      val out = Seq.newBuilder[String]
      r.counterValues.toSeq.sortBy(_._1.toString).foreach { case (k @ (n, ls), v) =>
        val prev = Option(lastCounts.get(k)).getOrElse(0L)
        if (v != prev) {
          out += s"$prefix$n:${v - prev}|c${tag(ls)}"
          lastCounts.put(k, v)
        }
      }
      r.gaugeValues.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), v) =>
        val rendered = if (v == v.toLong) v.toLong.toString else v.toString
        out += s"$prefix$n:$rendered|g${tag(ls)}"
      }
      r.timingValues.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), t) =>
        if (t.count > 0)
          out += s"$prefix$n:${t.sumNs / t.count / 1000000}|ms${tag(ls)}"
      }
      out.result()
    }
  }

  /** UDP sender — real datagrams to host:port; `mem://name` routes to
    * an in-process sink for offline verification.
    */
  def statsdSend(address: String, lines: Seq[String]): Unit =
    if (lines.isEmpty) ()
    else if (address.startsWith("mem://"))
      memSink(address.stripPrefix("mem://")).addAll(lines.asJava)
    else {
      val Array(host, port) = address.split(":", 2)
      val sock = new java.net.DatagramSocket()
      try {
        val addr = java.net.InetAddress.getByName(host)
        // pack multiple lines per datagram under the common 1432-byte
        // MTU guidance, one metric per newline
        val packets = lines.foldLeft(List(new StringBuilder)) { (acc, l) =>
          if (acc.head.length + l.length + 1 > 1432)
            new StringBuilder(l) :: acc
          else {
            if (acc.head.nonEmpty) acc.head.append('\n')
            acc.head.append(l); acc
          }
        }.reverse
        packets.filter(_.nonEmpty).foreach { p =>
          val bytes = p.toString.getBytes("UTF-8")
          sock.send(new java.net.DatagramPacket(bytes, bytes.length, addr,
            port.toInt))
        }
      } finally sock.close()
    }

  private val memSinks =
    new ConcurrentHashMap[String, java.util.concurrent.ConcurrentLinkedQueue[String]]()
  def memSink(name: String): java.util.concurrent.ConcurrentLinkedQueue[String] =
    memSinks.computeIfAbsent(name,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
  def dropMemSink(name: String): Unit = memSinks.remove(name)

  // ---- influxdb line-protocol push ----

  /** Registry snapshot as ILP lines (metric labels → tags, one `value`
    * field; timings as count/mean fields) with a shared timestamp.
    */
  def influxLines(r: Registry, tsNanos: Long): Seq[String] = {
    def esc(s: String) = s.replace("\\", "\\\\").replace(",", "\\,")
      .replace("=", "\\=").replace(" ", "\\ ")
    def tags(ls: Labels) =
      ls.map { case (k, v) => s",${esc(k)}=${esc(v)}" }.mkString
    val out = Seq.newBuilder[String]
    r.counterValues.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), v) =>
      out += s"${esc(n)}${tags(ls)} value=${v}i $tsNanos"
    }
    r.gaugeValues.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), v) =>
      out += s"${esc(n)}${tags(ls)} value=$v $tsNanos"
    }
    r.timingValues.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), t) =>
      if (t.count > 0)
        out += s"${esc(n)}${tags(ls)} count=${t.count}i,mean=${
          t.sumNs.toDouble / t.count} $tsNanos"
    }
    out.result()
  }

  /** POST a registry snapshot to an InfluxDB-compatible /write
    * endpoint (the questdb mem ILP service doubles as the offline
    * target — same wire format).
    */
  def influxPush(r: Registry, url: String, tsNanos: Long,
                 client: Http.Client = null): Unit = {
    val lines = influxLines(r, tsNanos)
    if (lines.nonEmpty) {
      val resolved = Option(client)
        .getOrElse(graft.sinks.QuestDb.resolveClient(url))
      val resp = resolved(Seq(Http.Request(
        url.stripSuffix("/") + "/write", "POST",
        Map("Content-Type" -> "text/plain; charset=utf-8"),
        lines.mkString("\n")))).head
      if (resp.status < 200 || resp.status > 299)
        throw new IllegalStateException(
          s"influxdb metrics push rejected (${resp.status})")
    }
  }
}
