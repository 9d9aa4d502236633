package graft.sources

import org.apache.spark.sql.functions._

import graft.operators.MetricsExport
import graft.sources.S3.Credentials
import graft.SparkSpec

/** aws_cloudwatch_logs input + aws_cloudwatch metrics output
  * (internal/impl/aws/cloudwatch/{input_logs.go,metrics.go}).
  */
class CloudWatchSpec extends SparkSpec {

  private val creds = Credentials("AKCW", "SKCW")

  private def fresh(): (String, CloudWatch.MemCloudWatch) = {
    val name = "cw_" + java.util.UUID.randomUUID.toString.replace("-", "")
    (name, CloudWatch.register(name, creds))
  }

  test("filter-log-events: interleaved timestamp order + stream metadata") {
    val (name, srv) = fresh()
    srv.seedEvent("g", "app-1", 30L, "m3")
    srv.seedEvent("g", "app-1", 10L, "m1")
    srv.seedEvent("g", "app-2", 20L, "m2")
    srv.seedEvent("g", "web-1", 15L, "w1")
    val out = CloudWatch.logsRead(spark, s"mem://$name", creds, "g",
      streamPrefix = "app-").collect().sortBy(_.getLong(3))
    assert(out.map(_.getString(0)).toSeq == Seq("m1", "m2", "m3"),
      "prefix-matched streams interleaved by timestamp")
    val meta = out.map(_.getMap[String, String](1))
    assert(meta.forall(_("cloudwatch_log_group") == "g"))
    assert(meta.map(_("cloudwatch_log_stream")).toSeq ==
      Seq("app-1", "app-2", "app-1"))
    CloudWatch.drop(name)
  }

  test("start_time, filter pattern, and the nextToken page walk") {
    val (name, srv) = fresh()
    (1 to 250).foreach(i =>
      srv.seedEvent("g", "s", i.toLong,
        if (i % 2 == 0) s"even row $i" else s"odd row $i"))
    // page size 100 → three pages; pattern keeps the evens; start_time
    // skips the first 50
    val out = CloudWatch.logsRead(spark, s"mem://$name", creds, "g",
      streamNames = Seq("s"), startTime = 51L, filterPattern = "even")
      .collect()
    assert(out.length == 100, "evens in [52,250]")
    assert(out.forall(_.getString(0).startsWith("even")))
    assert(out.forall(_.getLong(3) >= 51L))
    CloudWatch.drop(name)
  }

  test("both stream names and prefix rejected (input_logs.go:223)") {
    val (name, _) = fresh()
    intercept[IllegalArgumentException] {
      CloudWatch.logsRead(spark, s"mem://$name", creds, "g",
        streamNames = Seq("a"), streamPrefix = "b")
    }
    CloudWatch.drop(name)
  }

  test("metrics: counters/gauges/timings land as datums with dimensions") {
    val (name, srv) = fresh()
    val r = new MetricsExport.Registry
    r.counter("docs_total", Seq("lang" -> "en")).addAndGet(42L)
    r.counter("docs_total", Seq("lang" -> "fr")).addAndGet(7L)
    r.gaugeSet("queue_depth", 3.5)
    r.timing("proc_latency", 2000000L) // 2ms → 2000 microseconds
    val sent = CloudWatch.putMetricData(s"mem://$name", creds, "Graft", r)
    assert(sent == 4)
    assert(srv.metrics(("Graft", "docs_total", "lang=en")) == ((42.0, "Count")))
    assert(srv.metrics(("Graft", "docs_total", "lang=fr")) == ((7.0, "Count")))
    assert(srv.metrics(("Graft", "queue_depth", "")) == ((3.5, "None")))
    // metrics.go:189 — timings downgraded to microseconds
    assert(srv.metrics(("Graft", "proc_latency", "")) ==
      ((2000.0, "Microseconds")))
    CloudWatch.drop(name)
  }

  test("SigV4 is re-derived server-side; wrong secret rejected") {
    val (name, srv) = fresh()
    intercept[IllegalStateException] {
      CloudWatch.logsRead(spark, s"mem://$name",
        Credentials("AKCW", "WRONG"), "g")
    }
    assert(srv.rejected > 0)
    CloudWatch.drop(name)
  }
}
