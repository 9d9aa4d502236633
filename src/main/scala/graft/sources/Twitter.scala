package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Http

/** The `twitter_search` input (internal/impl/twitter/
  * search_input.tmpl.yaml — in the reference this is a TEMPLATE
  * composing generate → cache get → http → unarchive → cache set; here
  * it is a first-class input with the same wire contract): polls the
  * recent-search V2 API for tweets matching a query, emitting one
  * message per tweet (`{"id","text",...}`), with the last tweet id in
  * a cache so subsequent polls fetch only newer tweets via `since_id`.
  *
  * Auth is OAuth 2.0 client-credentials: one POST to `/oauth2/token`
  * with basic(api_key, api_secret) exchanging for a bearer token (the
  * template's `http.oauth2` block does the same exchange).
  *
  * First sweep (no cursor) bounds the backfill with
  * `start_time = now - backfill_period`. A `since_id` older than the
  * API's retention window is rejected server-side ("'since_id' must be
  * a tweet id created after ..."); that clears the cursor and returns
  * an empty sweep, matching the template's switch-on-error handler.
  *
  * DOCUMENTED DIVERGENCE: the template persists the id of the LAST
  * message it processes — with the API's newest-first response order
  * that is the OLDEST id of the batch, which would re-fetch the whole
  * batch on every poll. This input walks `meta.next_token` pages until
  * the sweep drains, then persists `meta.newest_id` from the first page
  * (falling back to the max data id) — forward progress without either
  * the template's re-fetch or the single-page overflow gap.
  */
object Twitter {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedClients = TrieMap.empty[String, Http.Client]

  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  def clientFor(baseUrl: String): Http.Client =
    if (baseUrl.startsWith("mem://")) {
      val name = baseUrl.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"twitter: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  /** One poll sweep. `nowMs` is injectable so gates stay deterministic
    * (start_time only matters on the cursor-less first sweep). The sweep
    * walks `meta.next_token` pages until it drains (bounded by
    * `maxPages`): more than one page of matches since the last cursor
    * must all be emitted before the cursor advances to `newest_id`, or
    * the overflow would be skipped forever.
    */
  def searchRead(spark: SparkSession, query: String,
                 apiKey: String, apiSecret: String,
                 tweetFields: Seq[String] = Seq.empty,
                 backfillSec: Long = 300L,
                 cursor: Option[(Cursors.Store, String)] = None,
                 baseUrl: String = "https://api.twitter.com",
                 client: Http.Client = null,
                 nowMs: Long = System.currentTimeMillis(),
                 maxPages: Int = 1000): DataFrame = {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    val bearer = exchangeBearer(base, apiKey, apiSecret, c)
    val since = cursor.flatMap { case (s, k) => s.get(k) }.filter(_.nonEmpty)
    val (all, newest, stale) = sweep(query, tweetFields, backfillSec,
      since, base, bearer, c, nowMs, maxPages)
    def emptyDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], BrokerStream.schema)
    if (stale) {
      // stale since_id → reset the cursor and skip the sweep (the
      // template's switch-on-error path)
      cursor.foreach { case (s, k) => s.set(k, "") }
      emptyDf
    } else {
      cursor.foreach { case (s, k) => newest.foreach(id => s.set(k, id)) }
      if (all.isEmpty) emptyDf
      else {
        val rows = all.zipWithIndex.map { case (t, i) =>
          Row(t.toString, Map.empty[String, String], null, i.toLong)
        }
        val slices = math.max(1,
          math.min(spark.sparkContext.defaultParallelism,
            rows.length / 256 + 1))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
      }
    }
  }

  /** Client-credentials exchange → bearer token. */
  private def exchangeBearer(base: String, apiKey: String,
                             apiSecret: String, c: Http.Client): String = {
    val tokResp = c(Seq(Http.Request(s"$base/oauth2/token", "POST", Map(
      "Authorization" -> ("Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$apiKey:$apiSecret".getBytes("UTF-8"))),
      "Content-Type" -> "application/x-www-form-urlencoded"),
      "grant_type=client_credentials"))).head
    if (tokResp.status != 200) throw new IllegalStateException(
      s"twitter: token exchange failed ${tokResp.status}")
    val bearer = mapper.readTree(tokResp.body).path("access_token")
      .asText("")
    if (bearer.isEmpty) throw new IllegalStateException(
      "twitter: token exchange returned no access_token")
    bearer
  }

  /** One incremental sweep: page walk to meta.next_token exhaustion
    * (data accumulates across pages; newest_id comes from the FIRST,
    * newest page, so a partial drain would be a gap), cursor = that
    * newest_id. `stale` = the retention-window since_id rejection —
    * the caller resets the cursor.
    */
  private def sweep(query: String, tweetFields: Seq[String],
                    backfillSec: Long, since: Option[String],
                    base: String, bearer: String, c: Http.Client,
                    nowMs: Long, maxPages: Int)
      : (Vector[com.fasterxml.jackson.databind.JsonNode],
         Option[String], Boolean) = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val pagination = since match {
      case Some(id) => s"&since_id=$id"
      case None =>
        val start = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochMilli(nowMs - backfillSec * 1000))
        s"&start_time=${enc(start)}"
    }
    val fieldsParam =
      if (tweetFields.isEmpty) ""
      else s"&tweet.fields=${enc(tweetFields.mkString(","))}"
    val data = Vector.newBuilder[com.fasterxml.jackson.databind.JsonNode]
    var newest: Option[String] = None
    var pageTok: Option[String] = None
    var pages = 0
    var stale = false
    var done = false
    while (!done && pages < maxPages) {
      val url = s"$base/2/tweets/search/recent?max_results=100" +
        s"&query=${enc(query)}$fieldsParam$pagination" +
        pageTok.map(t => s"&next_token=${enc(t)}").getOrElse("")
      val resp = c(Seq(Http.Request(url, "GET",
        Map("Authorization" -> s"Bearer $bearer"), ""))).head
      if (resp.status < 200 || resp.status > 299) {
        if (resp.body.contains(
            "'since_id' must be a tweet id created after")) {
          stale = true
          done = true
        } else throw new IllegalStateException(
          s"twitter: search returned ${resp.status}: ${resp.body.take(200)}")
      } else {
        val node = mapper.readTree(resp.body)
        val page = Option(node.get("data"))
          .map(_.elements().asScala.toVector).getOrElse(Vector.empty)
        data ++= page
        if (pages == 0) newest = Option(node.at("/meta/newest_id")
          .asText("")).filter(_.nonEmpty).orElse(
            page.map(_.path("id").asText("")).filter(_.nonEmpty)
              .sortBy(s => (s.length, s)).lastOption)
        pageTok = Option(node.at("/meta/next_token").asText(""))
          .filter(_.nonEmpty)
        pages += 1
        done = pageTok.isEmpty
      }
    }
    if (!done && !stale) System.err.println(
      s"[twitter] WARN stopped after $maxPages pages with more remaining")
    (data.result(), newest, stale)
  }

  /** The streaming form's sweep-per-trigger: cursor = newest tweet id,
    * committed by [[PollStream]] through the checkpoint WAL. A stale
    * cursor (past the retention window) resets to "" — the next sweep
    * re-enters via the backfill window, the template's switch-on-error
    * recovery. Emission is oldest-first within a sweep.
    */
  def poller(query: String, apiKey: String, apiSecret: String,
             tweetFields: Seq[String] = Seq.empty,
             backfillSec: Long = 300L,
             baseUrl: String = "https://api.twitter.com",
             client: Http.Client = null,
             nowMs: () => Long = () => System.currentTimeMillis(),
             maxPages: Int = 1000): PollStream.Poller = cursorOpt => {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    val bearer = exchangeBearer(base, apiKey, apiSecret, c)
    val (all, newest, stale) = sweep(query, tweetFields, backfillSec,
      cursorOpt.filter(_.nonEmpty), base, bearer, c, nowMs(), maxPages)
    if (stale) (Vector.empty, Some(""))
    else {
      val rows = all.reverse.map { t =>
        (t.toString, Map("twitter_id" -> t.path("id").asText("")))
      }
      (rows, newest.orElse(cursorOpt))
    }
  }

  /** In-memory API subset: the client-credentials exchange (tokens are
    * minted per corpus instance and checked on search), and
    * recent-search with since_id / max_results, newest-first data with
    * meta.newest_id — the wire shape the template consumes.
    */
  object InMemoryServer {
    final case class Tweet(id: Long, text: String)

    final case class Transport(tweets: Seq[Tweet],
                               retentionFloor: Long = 0L)
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      private val token = "tok-" + java.util.UUID.randomUUID.toString.take(8)

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        val uri = java.net.URI.create(q.url)
        uri.getPath match {
          case "/oauth2/token" =>
            require(q.headers.get("Authorization")
              .exists(_.startsWith("Basic ")), "fake twitter: basic auth")
            require(q.body == "grant_type=client_credentials",
              s"fake twitter: unexpected grant body ${q.body}")
            Http.Response(200,
              s"""{"token_type":"bearer","access_token":"$token"}""")
          case "/2/tweets/search/recent" =>
            require(q.headers.get("Authorization")
              .contains(s"Bearer $token"),
              "fake twitter: search must use the exchanged bearer token")
            val params = Option(uri.getRawQuery).getOrElse("").split("&")
              .filter(_.nonEmpty).map { kv =>
                val Array(k, v) = kv.split("=", 2)
                k -> java.net.URLDecoder.decode(v, "UTF-8")
              }.toMap
            val since = params.get("since_id").map(_.toLong)
            if (since.exists(_ < retentionFloor))
              Http.Response(400,
                """{"errors":[{"message":"'since_id' must be a tweet id """ +
                  """created after the retention window"}]}""")
            else {
              val max = params.get("max_results").map(_.toInt).getOrElse(100)
              val matched = tweets.filter(t => since.forall(t.id > _))
                .sortBy(-_.id) // newest first
              val start = params.get("next_token").map(_.toInt).getOrElse(0)
              val page = matched.slice(start, start + max)
              val data = page.map(t =>
                s"""{"id":"${t.id}","text":"${t.text}"}""").mkString(",")
              val next =
                if (start + max < matched.size)
                  s""","next_token":"${start + max}""""
                else ""
              val meta = page.headOption.map(p =>
                s""","meta":{"newest_id":"${p.id}",""" +
                  s""""result_count":${page.size}$next}""").getOrElse(
                s""","meta":{"result_count":0$next}""")
              Http.Response(200, s"""{"data":[$data]$meta}""")
            }
          case other =>
            Http.Response(404, s"""{"errors":[{"message":"$other"}]}""")
        }
      }
    }
  }
}
