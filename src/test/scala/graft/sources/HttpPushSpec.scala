package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Http

/** `http_server` push input over a REAL loopback HTTP server (JDK
  * built-in) — which also gives the production `Http.javaClient` its
  * first genuine end-to-end exercise: actual sockets, actual 429s,
  * actual retry rounds.
  */
class HttpPushSpec extends SparkSpec {
  import spark.implicits._

  test("posted messages become envelope rows with http_server_* metadata") {
    val srv = new HttpPushServer("/ingest")
    try {
      val df = (0 until 20).map(i => (i.toLong, s"""{"i":$i}"""))
        .toDF("id", "body")
        .withColumn("url", concat(lit(srv.url), lit("?src=test")))
      // the REAL JDK client, batched, against the real server
      val out = Http.requestBatched(df, "url", "body", "POST",
        Map("X-Graft" -> "yes"), batchSize = 8, Http.javaClient(),
        "resp", "status")
      assert(out.filter($"status" === 200).count() == 20)
      val got = srv.drain(spark)
      assert(got.count() == 20)
      val metas = got.select(
          $"metadata"("http_server_verb"),
          $"metadata"("http_server_request_path"),
          $"metadata"("http_server_remote_ip"),
          $"metadata"("X-graft"), $"metadata"("src"))
        .distinct().collect()
      assert(metas.length == 1)
      val m = metas.head
      assert(m.getString(0) == "POST" && m.getString(1) == "/ingest")
      assert(m.getString(2) == "127.0.0.1")
      assert(m.getString(3) == "yes", "request headers become metadata")
      assert(m.getString(4) == "test", "query params become metadata")
      // every posted body arrived exactly once
      val bodies = got.select($"value").as[String].collect().toSeq.sorted
      assert(bodies == (0 until 20).map(i => s"""{"i":$i}""").sorted)
    } finally srv.stop()
  }

  test("javaClient retry rounds recover from real 429 responses") {
    val srv = new HttpPushServer("/retry")
    try {
      srv.rejectNext(5) // first 5 requests get a genuine 429
      val df = (0 until 5).map(i => (i.toLong, s"m$i")).toDF("id", "body")
        .withColumn("url", lit(srv.url)).coalesce(1)
      val out = Http.requestBatched(df, "url", "body", "POST", Map.empty,
        batchSize = 8,
        Http.javaClient(retries = 3, retryPeriodMs = 100),
        "resp", "status")
      assert(out.filter($"status" === 200).count() == 5,
        "all rows recover after one retry round")
      assert(srv.receivedCount == 5, "each message ingested exactly once")
    } finally srv.stop()
  }
}
