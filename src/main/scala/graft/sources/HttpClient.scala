package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.blobl.Blobl
import graft.operators.Http

/** `http_client` input/output (inputs/http_client.adoc,
  * outputs/http_client.adoc) over the pluggable [[Http.Client]]
  * (stub:// = offline echo, real scheme = JDK client — the same
  * transport the `http` processor and `http_server` input use).
  *
  * The input is a DRIVER-side admission loop, not a distributed scan:
  * each request may interpolate fields of the previous page's last
  * message (the adoc's "Basic Pagination" contract), which makes the
  * request chain inherently sequential. The fetched messages then
  * parallelize like any bounded source. Page counts are admission
  * control (like JDBC's fetch loop), so the driver loop is the right
  * shape — the DATA never funnels through a single task.
  */
object HttpClient {

  /** Bounded paginated read.
    *
    *   - `urlTemplate`/`headers` values interpolate against the
    *     previous page's LAST message (`this.*`); the first request
    *     sees `{}` (adoc: "data from the previous successfully
    *     consumed message (if there was one)").
    *   - `streamLines` = `stream.enabled` with the `lines` scanner:
    *     each response body line is one message; otherwise the whole
    *     body is one message.
    *   - the loop stops on an empty body (`drop_empty_bodies`), a
    *     non-2xx status, `maxRequests`, or — when the template has no
    *     interpolation — after one request (polling forever is a
    *     stream concern; bounded runs take a snapshot).
    */
  def read(spark: SparkSession, urlTemplate: String, verb: String = "GET",
           headers: Map[String, String] = Map.empty, payload: String = "",
           streamLines: Boolean = false, maxRequests: Int = 100,
           client: Http.Client = null): DataFrame = {
    val resolved = Option(client).getOrElse(Http.clientFor(urlTemplate))
    val paginated = urlTemplate.contains("${!") ||
      headers.values.exists(_.contains("${!"))
    val out = Vector.newBuilder[String]
    var prev: Option[String] = None
    var n = 0
    var done = false
    while (!done && n < (if (paginated) maxRequests else 1)) {
      val url = interp(spark, urlTemplate, prev)
      val hdrs = headers.map { case (k, v) => (k, interp(spark, v, prev)) }
      val resp = resolved(Seq(Http.Request(url, verb, hdrs, payload))).head
      n += 1
      if (resp.status < 200 || resp.status > 299) {
        if (n == 1) throw new IllegalStateException(
          s"http_client: $url returned ${resp.status}")
        done = true // pagination past the end commonly 4xxs — stop clean
      } else if (resp.body.isEmpty) done = true
      else {
        val msgs =
          if (streamLines) resp.body.split("\n").toSeq.filter(_.nonEmpty)
          else Seq(resp.body)
        out ++= msgs
        prev = msgs.lastOption.orElse(prev)
        if (msgs.isEmpty) done = true
      }
    }
    val rows = out.result().zipWithIndex.map { case (v, i) =>
      Row(v, Map.empty[String, String], null, i.toLong)
    }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  private def interp(spark: SparkSession, template: String,
                     prevJson: Option[String]): String =
    if (!template.contains("${!")) template
    else {
      import spark.implicits._
      val df = Seq(prevJson.getOrElse("{}")).toDF("value")
      df.select(Blobl.interpolateJson(df, template).as("u"))
        .head().getString(0)
    }

  /** `http_client` output: one request per message, URL interpolated
    * per row, fanned out through the batched transport
    * (outputs/http_client.adoc). Any non-2xx after the client's own
    * retries fails the write — an output has no downstream error
    * channel to route to (the reference nacks the message the same
    * way).
    */
  def write(df: DataFrame, urlCol: org.apache.spark.sql.Column,
            verb: String = "POST", headers: Map[String, String] = Map.empty,
            batchSize: Int = 16, client: Http.Client = null,
            clientUrl: String = ""): Unit = {
    val resolved = Option(client).getOrElse(Http.clientFor(clientUrl))
    val sent = Http.requestBatched(
      df.withColumn("__hc_url", urlCol), "__hc_url", "value", verb,
      headers, batchSize, resolved, "__hc_resp", "__hc_status")
    val bad = sent.filter(org.apache.spark.sql.functions.col("__hc_status")
      .between(200, 299).unary_!).count()
    if (bad > 0) throw new IllegalStateException(
      s"http_client output: $bad messages rejected by the endpoint")
  }
}
