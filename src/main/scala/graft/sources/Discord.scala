package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** The `discord` input/output (inputs/discord.adoc,
  * outputs/discord.adoc; internal/impl/discord — contract only) over
  * the pluggable [[Http.Client]].
  *
  * Input (the REST backfill half): pages
  * `GET /channels/{id}/messages?after=<cursor>&limit=100` forward from
  * the cache-persisted `last_message_id`, emitting each page
  * oldest-first (Discord returns pages newest-first; the reference
  * walks them in reverse the same way) and persisting the newest id
  * seen. The live half — gateway websocket events — needs a persistent
  * socket and stays environment-blocked; the batch form is the
  * backfill sweep, which is also exactly what the reference performs
  * on connect before handing over to the gateway.
  *
  * Output: one `POST /channels/{id}/messages` per message, bot-token
  * auth. A message that is already a JSON object matching the API
  * message type posts directly; anything else wraps as
  * `{"content": <raw>}` (outputs/discord.adoc).
  */
object Discord {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedClients = TrieMap.empty[String, Http.Client]

  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  def clientFor(baseUrl: String): Http.Client =
    if (baseUrl.startsWith("mem://")) {
      val name = baseUrl.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"discord: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  private def bot(token: String): Map[String, String] = Map(
    "Authorization" -> s"Bot $token",
    "Content-Type" -> "application/json")

  /** Backfill sweep: every message after the persisted cursor, oldest
    * first (`__seq` = emission order), cursor advanced to the newest
    * id seen.
    */
  def read(spark: SparkSession, channelId: String, botToken: String,
           cursor: Option[(Cursors.Store, String)] = None,
           baseUrl: String = "https://discord.com/api/v10",
           client: Http.Client = null, limit: Int = 100,
           maxPages: Int = 10000): DataFrame = {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val after0 = cursor.flatMap { case (s, k) => s.get(k) }.getOrElse("")
    val (msgs, after) = sweep(channelId, botToken,
      baseUrl.stripSuffix("/"), c, limit, maxPages, after0)
    cursor.foreach { case (s, k) => if (after.nonEmpty) s.set(k, after) }
    val rows = msgs.zipWithIndex.map { case (v, i) =>
      Row(v, Map.empty[String, String], null, i.toLong)
    }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  /** One incremental sweep: page-walk forward from `after0`, oldest
    * first, cursor = newest id seen ("" when nothing new).
    */
  private def sweep(channelId: String, botToken: String, base: String,
                    c: Http.Client, limit: Int, maxPages: Int,
                    after0: String): (Vector[String], String) = {
    var after = after0
    val out = Vector.newBuilder[String]
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val url = s"$base/channels/$channelId/messages?limit=$limit" +
        (if (after.nonEmpty) s"&after=$after" else "")
      val resp = c(Seq(Http.Request(url, "GET", bot(botToken), ""))).head
      if (resp.status < 200 || resp.status > 299)
        throw new IllegalStateException(
          s"discord: ${resp.status}: ${resp.body.take(200)}")
      // newest-first page → emit oldest-first, advance to the newest
      val msgs = mapper.readTree(resp.body).elements().asScala.toVector
      if (msgs.isEmpty) done = true
      else {
        msgs.reverseIterator.foreach(m => out += m.toString)
        after = msgs.head.path("id").asText("")
        pages += 1
      }
    }
    (out.result(), after)
  }

  /** The streaming form's sweep-per-trigger ([[PollStream]] commits
    * the returned cursor — the newest message id — through Spark's
    * checkpoint WAL; the cursor-in/cursor-out shape of
    * [[Jira.issuesPoller]]).
    */
  def poller(channelId: String, botToken: String,
             baseUrl: String = "https://discord.com/api/v10",
             client: Http.Client = null, limit: Int = 100,
             maxPages: Int = 10000): PollStream.Poller = cursorOpt => {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val (msgs, after) = sweep(channelId, botToken,
      baseUrl.stripSuffix("/"), c, limit, maxPages,
      cursorOpt.getOrElse(""))
    val rows = msgs.map { v =>
      (v, Map(
        "discord_channel_id" -> channelId,
        "discord_message_id" -> mapper.readTree(v).path("id").asText("")))
    }
    (rows, if (after.nonEmpty) Some(after) else cursorOpt)
  }

  /** One POST per message; JSON objects post directly, anything else
    * wraps as `{"content": ...}`.
    */
  def write(df: DataFrame, channelId: String, botToken: String,
            baseUrl: String = "https://discord.com/api/v10",
            client: Http.Client = null, batchSize: Int = 16): Unit = {
    val c = Option(client).getOrElse(clientFor(baseUrl))
    val base = baseUrl.stripSuffix("/")
    val body = when(
      // a JSON object passes through; else wrap as content
      get_json_object(col(Envelope.ValueCol), "$").startsWith("{"),
      col(Envelope.ValueCol))
      .otherwise(to_json(struct(col(Envelope.ValueCol).as("content"))))
    val prepared = df
      .withColumn("__dc_body", body)
      .withColumn("__dc_url",
        lit(s"$base/channels/$channelId/messages"))
    val sent = Http.requestBatched(prepared, "__dc_url", "__dc_body",
      "POST", bot(botToken), batchSize, c, "__resp", "__status")
    val bad = sent.filter(!col("__status").between(200, 299)).count()
    if (bad > 0) throw new IllegalStateException(
      s"discord: $bad messages rejected")
  }

  /** In-memory API-subset server: forward pagination over an
    * ascending-id corpus served newest-first per page (the Discord
    * wire order), and message-create POSTs recorded with assigned ids.
    */
  object InMemoryServer {
    final case class Msg(id: Long, channelId: String, content: String,
                         authorId: String)

    def msgJson(m: Msg): String =
      s"""{"id":"${m.id}","channel_id":"${m.channelId}",""" +
        s""""content":"${m.content}","author":{"id":"${m.authorId}"}}"""

    final case class Transport(msgs: Seq[Msg])
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      val posted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      private val idc = new java.util.concurrent.atomic.AtomicLong(1000000)

      private val ChannelMsgs = "(?:/api/v\\d+)?/channels/([^/]+)/messages".r

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        require(q.headers.get("Authorization").exists(_.startsWith("Bot ")),
          "fake discord: missing bot auth")
        val uri = java.net.URI.create(q.url)
        val params = Option(uri.getRawQuery).getOrElse("").split("&")
          .filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        (q.verb, uri.getPath) match {
          case ("GET", ChannelMsgs(cid)) =>
            val after = params.get("after").map(_.toLong).getOrElse(-1L)
            val limit = params.get("limit").map(_.toInt).getOrElse(100)
            val page = msgs.filter(m => m.channelId == cid && m.id > after)
              .sortBy(_.id).take(limit).reverse // newest-first wire order
            Http.Response(200, page.map(msgJson).mkString("[", ",", "]"))
          case ("POST", ChannelMsgs(cid)) =>
            val n = Shared.mapper.readTree(q.body)
            if (!n.isObject || n.path("content").asText("").isEmpty)
              Http.Response(400, """{"message":"Cannot send an empty message"}""")
            else {
              val obj = n.asInstanceOf[com.fasterxml.jackson.databind
                .node.ObjectNode]
              obj.put("id", idc.incrementAndGet().toString)
              obj.put("channel_id", cid)
              posted.add(obj.toString)
              Http.Response(200, obj.toString)
            }
          case (_, other) =>
            Http.Response(404, s"""{"message":"no route $other"}""")
        }
      }
    }
  }
}
