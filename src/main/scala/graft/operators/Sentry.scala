package graft.operators

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `sentry_capture` processor (processors/sentry_capture.adoc;
  * internal/impl/sentry — contract only): builds one Sentry event per
  * message (interpolated `message`, bloblang `context` object-of-
  * objects, `extras` object, static tags/environment/release/level),
  * submits it to the DSN's store endpoint, and passes the message
  * through UNCHANGED — capture is observation, not transformation, so
  * submission failures warn rather than fail the pipeline (the
  * reference's async SDK transport drops the same way).
  *
  * DSN `scheme://key@host/project` resolves to
  * `scheme://host/api/project/store/` with the `X-Sentry-Auth` header.
  * `samplingRate` keeps a deterministic per-row hash fraction —
  * deterministic so a re-executed task captures the same subset (a
  * random sample would double-capture under Spark retries).
  */
object Sentry {

  private val namedClients = TrieMap.empty[String, Http.Client]

  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  /** `scheme://key@host[:port]/project`. Parsed with a regex, not
    * java.net.URI: URI's server-based authority parsing rejects
    * underscores in hostnames (returns null userInfo/host), and the
    * mem:// seam names contain them.
    */
  private val DsnRe = "([a-z+.-]+)://([^@/]+)@([^/]+)/(.+)".r

  /** DSN → (store URL, auth header). mem://key@name DSNs resolve to a
    * registered test transport.
    */
  private[operators] def storeEndpoint(dsn: String): (String, String) =
    dsn match {
      case DsnRe(scheme, key, host, project) =>
        (s"$scheme://$host/api/$project/store/",
          s"Sentry sentry_version=7, sentry_key=$key")
      case _ => throw new IllegalArgumentException(
        s"sentry: DSN has no key: $dsn")
    }

  def clientFor(dsn: String): Http.Client =
    dsn match {
      case DsnRe("mem", _, host, _) =>
        val name = host.takeWhile(_ != ':')
        reqs => namedClients.getOrElse(name, sys.error(
          s"sentry: no client registered for mem://$name"))(reqs)
      case _ => Http.javaClient()
    }

  /** Pass-through capture: `messageCol` (interpolated), optional
    * `contextJson`/`extrasJson` columns (already-rendered JSON
    * objects), static tags/env/release/level.
    */
  def capture(df: DataFrame, dsn: String, messageCol: Column,
              contextJson: Column = null, extrasJson: Column = null,
              tags: Map[String, String] = Map.empty,
              environment: String = "", release: String = "",
              level: String = "INFO", samplingRate: Double = 1.0,
              client: Http.Client = null, batchSize: Int = 64): DataFrame = {
    require(samplingRate >= 0 && samplingRate <= 1,
      s"sentry: sampling_rate must be in [0,1], got $samplingRate")
    val lvl = level.toLowerCase match {
      case l @ ("debug" | "info" | "warning" | "error" | "fatal") => l
      case "warn" => "warning"
      case other => throw new IllegalArgumentException(
        s"sentry: unknown level '$other'")
    }
    if (samplingRate == 0.0) return df
    val c = Option(client).getOrElse(clientFor(dsn))
    val (url, auth) = storeEndpoint(dsn)
    // tags as a native map and contexts/extra through parse_json
    // (variant), so to_json renders them as REAL nested objects — the
    // store API's shape — not escaped strings
    val tagsCol =
      if (tags.isEmpty) lit(null).cast("map<string,string>")
      else map(tags.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val event = to_json(struct(
      messageCol.as("message"),
      lit(lvl).as("level"),
      (if (environment.nonEmpty) lit(environment)
       else lit(null).cast("string")).as("environment"),
      (if (release.nonEmpty) lit(release)
       else lit(null).cast("string")).as("release"),
      tagsCol.as("tags"),
      Option(contextJson).map(parse_json)
        .getOrElse(lit(null).cast("string")).as("contexts"),
      Option(extrasJson).map(parse_json)
        .getOrElse(lit(null).cast("string")).as("extra")))
    // deterministic sample: stable under task retries
    val keep =
      if (samplingRate >= 1.0) lit(true)
      else pmod(xxhash64(col(graft.sources.Envelope.ValueCol)), lit(10000)) <
        lit((samplingRate * 10000).toLong)
    val sampled = df.withColumn("__sentry_event", when(keep, event))
    val sent = Http.requestBatched(
      sampled.withColumn("__sentry_url",
        when(col("__sentry_event").isNotNull, lit(url))),
      "__sentry_url", "__sentry_event", "POST",
      Map("X-Sentry-Auth" -> auth, "Content-Type" -> "application/json"),
      batchSize, c, "__sentry_resp", "__sentry_status")
      // the capture POST is a side effect riding the plan: without a
      // barrier every downstream action re-executes it and every event
      // double-sends (the same replay hazard sql_insert guards
      // against) — localCheckpoint materializes the capture exactly
      // once per call
      .localCheckpoint()
    // observation, not transformation: warn on rejects, pass through
    val bad = sent.filter(col("__sentry_status").isNotNull &&
      col("__sentry_status") =!= -2 &&
      !col("__sentry_status").between(200, 299)).count()
    if (bad > 0) System.err.println(
      s"[sentry_capture] WARN $bad events rejected by the store endpoint")
    sent.drop("__sentry_event", "__sentry_url", "__sentry_resp",
      "__sentry_status")
  }

  /** In-memory store endpoint: validates the auth header and records
    * event JSON bodies.
    */
  object InMemoryServer {
    final case class Transport(rejectAll: Boolean = false)
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        require(q.headers.get("X-Sentry-Auth")
          .exists(_.contains("sentry_key=")), "fake sentry: missing auth")
        require(q.url.endsWith("/store/"),
          s"fake sentry: unexpected endpoint ${q.url}")
        if (rejectAll) Http.Response(403, """{"detail":"denied"}""")
        else { events.add(q.body); Http.Response(200, """{"id":"evt"}""") }
      }
    }
  }
}
