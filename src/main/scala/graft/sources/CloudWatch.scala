package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.{Http, MetricsExport}
import graft.sources.S3.Credentials

/** The AWS CloudWatch pair that closes the reference's AWS family:
  *
  *  - `aws_cloudwatch_logs` INPUT
  *    (internal/impl/aws/cloudwatch/input_logs.go — contract only, the
  *    reference rides the SDK): FilterLogEvents over the public
  *    Logs_20140328 JSON 1.1 protocol, walking the nextToken chain
  *    from `start_time`, stream selection by explicit names OR prefix
  *    (mutually exclusive, input_logs.go:223), events interleaved in
  *    timestamp order, `cloudwatch_log_group`/`cloudwatch_log_stream`
  *    metadata per message (input_logs.go:71-72). Position is tracked
  *    in memory only — a restart resumes from start_time
  *    (input_logs.go:61), which is why no checkpoint file exists here.
  *
  *  - `aws_cloudwatch` metrics OUTPUT
  *    (internal/impl/aws/cloudwatch/metrics.go): a [[MetricsExport
  *    .Registry]] flushed through PutMetricData (the Query-API form
  *    protocol), counters/gauges as values, timings DOWNGRADED to
  *    microseconds (metrics.go:189 — CloudWatch's smallest timing
  *    unit), label sets as dimensions.
  *
  * Scale shape: the log page walk is driver admission (a paged,
  * token-chained API — same judgment as the jira/splunk pollers); the
  * decoded events parallelize. Metric flushes are tiny periodic
  * driver-side posts, exactly like the statsd/influx exporters.
  * Every request is SigV4-signed; the loopback re-derives signatures.
  */
object CloudWatch {

  private def mapper = new ObjectMapper()

  // ───────────────────── aws_cloudwatch_logs input ─────────────────────

  /** One FilterLogEvents page walk → DataFrame of events. */
  def logsRead(spark: SparkSession, endpoint: String, creds: Credentials,
               logGroup: String, streamNames: Seq[String] = Nil,
               streamPrefix: String = null, startTime: Long = 0L,
               filterPattern: String = null,
               structuredLog: Boolean = false,
               client: Http.Client = null): DataFrame = {
    require(streamNames.isEmpty || streamPrefix == null,
      "cannot specify both log_stream_names and log_stream_prefix")
    val c = Option(client).getOrElse(resolveClient(endpoint))
    val events = mutable.Buffer[(String, String, Long, String, String)]()
    var nextToken: String = null
    var going = true
    while (going) {
      val body = mapper.createObjectNode()
      body.put("logGroupName", logGroup)
      if (streamNames.nonEmpty) {
        val a = body.putArray("logStreamNames")
        streamNames.foreach(a.add)
      }
      if (streamPrefix != null) body.put("logStreamNamePrefix", streamPrefix)
      if (startTime > 0) body.put("startTime", startTime)
      if (filterPattern != null) body.put("filterPattern", filterPattern)
      if (nextToken != null) body.put("nextToken", nextToken)
      val r = call(c, endpoint, creds, "logs",
        "Logs_20140328.FilterLogEvents", body.toString)
      r.path("events").elements().asScala.foreach { e =>
        events += ((logGroup, e.get("logStreamName").asText,
          e.get("timestamp").asLong, e.get("message").asText,
          e.get("eventId").asText))
      }
      nextToken = r.path("nextToken").asText(null)
      going = nextToken != null
    }
    val rows = events.toSeq.map { case (g, s, ts, msg, id) =>
      if (structuredLog) {
        // input_logs.go:442-457 — Confluent-style structured JSON body
        val o = mapper.createObjectNode()
        o.put("message", msg)
        o.put("log_group", g)
        o.put("timestamp", ts)
        o.put("ingestion_time", ts)
        o.put("log_stream", s)
        o.put("event_id", id)
        Row(o.toString, Map.empty[String, String], null, ts)
      } else
        Row(msg, Map("cloudwatch_log_group" -> g, "cloudwatch_log_stream" -> s,
          "cloudwatch_event_id" -> id), null, ts)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(math.max(rows.size, 1),
          spark.sparkContext.defaultParallelism))),
      BrokerStream.schema)
  }

  // ──────────────────── aws_cloudwatch metrics output ────────────────────

  /** Flush a metrics registry through PutMetricData (Query API form
    * body). Returns the number of datums sent.
    */
  def putMetricData(endpoint: String, creds: Credentials, namespace: String,
                    r: MetricsExport.Registry,
                    client: Http.Client = null): Int = {
    val c = Option(client).getOrElse(resolveClient(endpoint))
    val datums = mutable.Buffer[(String, Seq[(String, String)], Double, String)]()
    r.counterValues.foreach { case ((n, ls), v) =>
      datums += ((n, ls, v.toDouble, "Count"))
    }
    r.gaugeValues.foreach { case ((n, ls), v) =>
      datums += ((n, ls, v, "None"))
    }
    r.timingValues.foreach { case ((n, ls), t) =>
      // metrics.go:189 — microseconds, CloudWatch's smallest unit
      datums += ((n, ls, t.sumNs.toDouble / t.count / 1000.0, "Microseconds"))
    }
    if (datums.isEmpty) return 0
    val sb = new StringBuilder("Action=PutMetricData&Version=2010-08-01")
    sb.append("&Namespace=").append(java.net.URLEncoder.encode(namespace, "UTF-8"))
    datums.zipWithIndex.foreach { case ((n, ls, v, unit), i0) =>
      val i = i0 + 1
      sb.append(s"&MetricData.member.$i.MetricName=")
        .append(java.net.URLEncoder.encode(n, "UTF-8"))
      sb.append(s"&MetricData.member.$i.Value=").append(v.toString)
      sb.append(s"&MetricData.member.$i.Unit=").append(unit)
      ls.zipWithIndex.foreach { case ((lk, lv), j0) =>
        val j = j0 + 1
        sb.append(s"&MetricData.member.$i.Dimensions.member.$j.Name=")
          .append(java.net.URLEncoder.encode(lk, "UTF-8"))
        sb.append(s"&MetricData.member.$i.Dimensions.member.$j.Value=")
          .append(java.net.URLEncoder.encode(lv, "UTF-8"))
      }
    }
    val resp = AwsApi.signedPost(c, endpoint, creds, "monitoring", "/",
      sb.toString, Map("Content-Type" -> "application/x-www-form-urlencoded"))
    if (resp.status != 200)
      throw new IllegalStateException(
        s"PutMetricData: ${resp.status} ${resp.body.take(200)}")
    datums.size
  }

  private def call(c: Http.Client, endpoint: String, creds: Credentials,
                   service: String, target: String, body: String): JsonNode = {
    val r = AwsApi.signedPost(c, endpoint, creds, service, "/", body,
      Map("X-Amz-Target" -> target,
        "Content-Type" -> "application/x-amz-json-1.1"))
    if (r.status / 100 != 2)
      throw new IllegalStateException(s"$target -> ${r.status}: ${r.body}")
    mapper.readTree(r.body)
  }

  // ─────────────────────── loopback server ───────────────────────

  /** In-memory CloudWatch (logs + monitoring), SigV4-verified. */
  final class MemCloudWatch(creds: Credentials, pageSize: Int = 100) {
    private val m = new ObjectMapper()
    // group → stream → events (ts, message)
    private val groups = mutable.LinkedHashMap
      .empty[String, mutable.LinkedHashMap[String, mutable.ArrayBuffer[(Long, String)]]]
    /** namespace → (metric, dimensions) → (value, unit) */
    val metrics: mutable.LinkedHashMap[(String, String, String), (Double, String)] =
      mutable.LinkedHashMap.empty
    private val eventSeq = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var rejected = 0

    def seedEvent(group: String, stream: String, ts: Long,
                  message: String): Unit = synchronized {
      groups.getOrElseUpdate(group, mutable.LinkedHashMap.empty)
        .getOrElseUpdate(stream, mutable.ArrayBuffer.empty) += ((ts, message))
      ()
    }

    def handle(q: Http.Request): Http.Response = synchronized {
      val service =
        if (q.headers.get("X-Amz-Target").exists(_.startsWith("Logs_")))
          "logs" else "monitoring"
      AwsApi.verifySig(q, creds, service) match {
        case Some(_) =>
          rejected += 1
          return Http.Response(403, """{"__type":"AccessDenied"}""")
        case None => ()
      }
      if (service == "monitoring") handleMetrics(q.body)
      else handleLogs(m.readTree(q.body))
    }

    private def handleLogs(body: JsonNode): Http.Response = {
      val group = groups.getOrElse(body.path("logGroupName").asText,
        return Http.Response(400, """{"__type":"ResourceNotFoundException"}"""))
      val names = body.path("logStreamNames").elements().asScala
        .map(_.asText).toSet
      val prefix = body.path("logStreamNamePrefix").asText(null)
      val startTime = body.path("startTime").asLong(0)
      val pattern = body.path("filterPattern").asText(null)
      val offset = body.path("nextToken").asText("0").toInt
      // interleaved timestamp order across matching streams — the
      // FilterLogEvents contract
      val all = group.iterator
        .filter { case (s, _) =>
          (names.isEmpty || names.contains(s)) &&
            (prefix == null || s.startsWith(prefix))
        }
        .flatMap { case (s, evs) => evs.map { case (ts, msg) => (ts, s, msg) } }
        .filter { case (ts, _, msg) =>
          ts >= startTime &&
            (pattern == null ||
              pattern.split("\\s+").forall(t => msg.contains(t.stripPrefix("\"").stripSuffix("\""))))
        }
        .toVector.sortBy(_._1)
      val page = all.slice(offset, offset + pageSize)
      val o = m.createObjectNode()
      val arr = o.putArray("events")
      page.foreach { case (ts, s, msg) =>
        val e = arr.addObject()
        e.put("logStreamName", s)
        e.put("timestamp", ts)
        e.put("message", msg)
        e.put("ingestionTime", ts)
        e.put("eventId", java.lang.Long.toString(eventSeq.incrementAndGet()))
        ()
      }
      if (offset + pageSize < all.size)
        o.put("nextToken", (offset + pageSize).toString)
      Http.Response(200, o.toString)
    }

    private def handleMetrics(form: String): Http.Response = {
      val kv = form.split("&").map(_.split("=", 2)).collect {
        case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      if (!kv.get("Action").contains("PutMetricData"))
        return Http.Response(400, "unknown action")
      val ns = kv.getOrElse("Namespace", "")
      val MemberRe = """MetricData\.member\.(\d+)\.MetricName""".r
      kv.keys.collect { case MemberRe(i) => i }.foreach { i =>
        val name = kv(s"MetricData.member.$i.MetricName")
        val value = kv(s"MetricData.member.$i.Value").toDouble
        val unit = kv.getOrElse(s"MetricData.member.$i.Unit", "None")
        val DimRe = (s"MetricData\\.member\\.$i\\.Dimensions\\.member\\.(\\d+)\\.Name").r
        val dims = kv.keys.collect { case DimRe(j) => j }.toSeq.sorted.map { j =>
          kv(s"MetricData.member.$i.Dimensions.member.$j.Name") + "=" +
            kv(s"MetricData.member.$i.Dimensions.member.$j.Value")
        }.mkString(",")
        metrics((ns, name, dims)) = (value, unit)
      }
      Http.Response(200,
        """<PutMetricDataResponse><ResponseMetadata/></PutMetricDataResponse>""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemCloudWatch]()

  def register(name: String, creds: Credentials): MemCloudWatch =
    registry.computeIfAbsent(name, _ => new MemCloudWatch(creds))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handle(r))
          .getOrElse(Http.Response(404, "no such cloudwatch"))
      }
    } else Http.javaClient()
}
