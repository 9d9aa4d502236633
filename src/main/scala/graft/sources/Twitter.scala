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
  * batch on every poll. This input persists `meta.newest_id` (falling
  * back to the max data id), which is what the `since_id` contract
  * needs for exactly-once forward progress.
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
    * (start_time only matters on the cursor-less first sweep).
    */
  def searchRead(spark: SparkSession, query: String,
                 apiKey: String, apiSecret: String,
                 tweetFields: Seq[String] = Seq.empty,
                 backfillSec: Long = 300L,
                 cursor: Option[(Cursors.Store, String)] = None,
                 baseUrl: String = "https://api.twitter.com",
                 client: Http.Client = null,
                 nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")

    // client-credentials exchange
    val tokResp = c(Seq(Http.Request(s"$base/oauth2/token", "POST", Map(
      "Authorization" -> ("Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$apiKey:$apiSecret".getBytes("UTF-8"))),
      "Content-Type" -> "application/x-www-form-urlencoded"),
      "grant_type=client_credentials"))).head
    if (tokResp.status != 200) throw new IllegalStateException(
      s"twitter: token exchange failed ${tokResp.status}")
    val bearer = mapper.readTree(tokResp.body).path("access_token").asText("")
    if (bearer.isEmpty) throw new IllegalStateException(
      "twitter: token exchange returned no access_token")

    val since = cursor.flatMap { case (s, k) => s.get(k) }.filter(_.nonEmpty)
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
    val url = s"$base/2/tweets/search/recent?max_results=100" +
      s"&query=${enc(query)}$fieldsParam$pagination"
    val resp = c(Seq(Http.Request(url, "GET",
      Map("Authorization" -> s"Bearer $bearer"), ""))).head

    def emptyDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], BrokerStream.schema)

    if (resp.status < 200 || resp.status > 299) {
      // stale since_id → reset the cursor and skip the sweep (the
      // template's switch-on-error path)
      if (resp.body.contains("'since_id' must be a tweet id created after")) {
        cursor.foreach { case (s, k) => s.set(k, "") }
        emptyDf
      } else throw new IllegalStateException(
        s"twitter: search returned ${resp.status}: ${resp.body.take(200)}")
    } else {
      val node = mapper.readTree(resp.body)
      val data = Option(node.get("data"))
        .map(_.elements().asScala.toVector).getOrElse(Vector.empty)
      val newest = Option(node.at("/meta/newest_id").asText(""))
        .filter(_.nonEmpty).orElse(
          data.map(_.path("id").asText("")).filter(_.nonEmpty)
            .sortBy(s => (s.length, s)).lastOption)
      cursor.foreach { case (s, k) =>
        newest.foreach(id => s.set(k, id))
      }
      if (data.isEmpty) emptyDf
      else {
        val rows = data.zipWithIndex.map { case (t, i) =>
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
              val page = tweets.filter(t => since.forall(t.id > _))
                .sortBy(-_.id).take(max) // newest first
              val data = page.map(t =>
                s"""{"id":"${t.id}","text":"${t.text}"}""").mkString(",")
              val meta = page.headOption.map(p =>
                s""","meta":{"newest_id":"${p.id}",""" +
                  s""""result_count":${page.size}}""").getOrElse(
                ""","meta":{"result_count":0}""")
              Http.Response(200, s"""{"data":[$data]$meta}""")
            }
          case other =>
            Http.Response(404, s"""{"errors":[{"message":"$other"}]}""")
        }
      }
    }
  }
}
