package graft.sinks

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Http

/** `snowflake_streaming` output (internal/impl/snowflake/
  * output_snowflake_streaming.go + streaming/rest.go — contract only):
  * the Snowpipe Streaming REST protocol's DELIVERY semantics —
  *
  *   - `channels/open` names a (database, schema, table, channel)
  *     stream and returns a `client_sequencer` (each open FENCES
  *     earlier writers of the same channel: their registrations are
  *     rejected with the wrong-sequencer status) plus the channel's
  *     latest committed `offset_token`;
  *   - data ships as staged blobs (`PUT` to the stage location) and
  *     lands via `channels/write/blobs`, registering per-channel
  *     chunks with `[start, end]` offset tokens under the writer's
  *     sequencer;
  *   - EXACTLY-ONCE rides the offset token: a batch whose end token
  *     is lexicographically ≤ the channel's committed token is a
  *     duplicate of already-committed data and is dropped (the
  *     documented `offset_token` contract of the output) — restarts
  *     re-send and the channel absorbs the overlap;
  *   - `channels/status` exposes committed tokens for monitoring.
  *
  * DOCUMENTED DIVERGENCE: the reference encodes chunks as encrypted
  * bdec/parquet files; that file format is env-blocked here, so blobs
  * carry NDJSON — the channel/sequencer/offset-token protocol, which
  * is what a pipeline observes, is implemented faithfully.
  *
  * Spark shape: one channel per partition (`<prefix>-<partitionId>`,
  * the output's channel_prefix scheme), opened and written
  * executor-side — no shuffle; per-channel ordering is the partition
  * order, matching the reference's one-channel-per-writer rule.
  */
object Snowpipe {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedServices = TrieMap.empty[String, Service]
  def serviceFor(name: String): Service =
    namedServices.getOrElseUpdate(name, new Service)
  def dropService(name: String): Unit = { namedServices.remove(name); () }

  def clientFor(baseUrl: String): Http.Client =
    if (baseUrl.startsWith("mem://"))
      serviceFor(baseUrl.stripPrefix("mem://")).client
    else Http.javaClient()

  final case class OpenedChannel(channel: String, clientSequencer: Long,
                                 committedOffsetToken: Option[String])

  def openChannel(baseUrl: String, c: Http.Client, database: String,
                  schema: String, table: String,
                  channel: String): OpenedChannel = {
    val body = s"""{"request_id":"r-${java.util.UUID.randomUUID}",""" +
      s""""role":"GRAFT","channel":${q(channel)},""" +
      s""""table":${q(table)},"database":${q(database)},""" +
      s""""schema":${q(schema)},"write_mode":"CLOUD_STORAGE"}"""
    val resp = c(Seq(Http.Request(
      s"${baseUrl.stripSuffix("/")}/v1/streaming/channels/open",
      "POST", Map("Content-Type" -> "application/json"), body))).head
    val n = mapper.readTree(resp.body)
    if (resp.status != 200 || n.path("status_code").asLong(-1) != 0)
      throw new IllegalStateException(
        s"snowpipe: open channel failed: ${resp.body.take(200)}")
    OpenedChannel(channel, n.get("client_sequencer").asLong,
      Option(n.get("offset_token")).filterNot(_.isNull).map(_.asText))
  }

  /** Stage one blob then register it for a single channel chunk.
    * Returns false when the service deduplicated (token ≤ committed);
    * throws on fencing (a newer writer opened the channel).
    */
  def writeBlob(baseUrl: String, c: Http.Client, database: String,
                schema: String, table: String, opened: OpenedChannel,
                rows: Seq[String], startToken: String,
                endToken: String): Boolean = {
    val base = baseUrl.stripSuffix("/")
    val path = s"blobs/${java.util.UUID.randomUUID}.ndjson"
    val put = c(Seq(Http.Request(s"$base/stage/$path", "PUT",
      Map("Content-Type" -> "application/octet-stream"), "",
      bodyBytes = (rows.mkString("\n") + "\n").getBytes("UTF-8")))).head
    if (put.status / 100 != 2)
      throw new IllegalStateException(s"snowpipe: stage put ${put.status}")
    val body = s"""{"request_id":"r-${java.util.UUID.randomUUID}",""" +
      s""""role":"GRAFT","is_iceberg":false,"blobs":[{""" +
      s""""path":${q(path)},"chunks":[{""" +
      s""""database":${q(database)},"schema":${q(schema)},""" +
      s""""table":${q(table)},"channels":[{""" +
      s""""channel":${q(opened.channel)},""" +
      s""""client_sequencer":${opened.clientSequencer},""" +
      s""""start_offset_token":${q(startToken)},""" +
      s""""end_offset_token":${q(endToken)},""" +
      s""""row_count":${rows.size}}]}]}]}"""
    val resp = c(Seq(Http.Request(
      s"$base/v1/streaming/channels/write/blobs", "POST",
      Map("Content-Type" -> "application/json"), body))).head
    val n = mapper.readTree(resp.body)
    val st = n.at("/blobs/0/chunks/0/channels/0/status_code").asLong(-1)
    st match {
      case 0 => true
      case 7 => false // dedupe: token ≤ committed
      case 20 => throw new IllegalStateException(
        "snowpipe: fenced — a newer writer opened this channel " +
          "(wrong client_sequencer)")
      case other => throw new IllegalStateException(
        s"snowpipe: register blob status $other: ${resp.body.take(200)}")
    }
  }

  /** Latest committed offset tokens per channel. */
  def channelStatus(baseUrl: String, c: Http.Client, database: String,
                    schema: String, table: String,
                    channels: Seq[String]): Map[String, Option[String]] = {
    val body = s"""{"request_id":"r","role":"GRAFT",""" +
      s""""database":${q(database)},"schema":${q(schema)},""" +
      s""""table":${q(table)},""" +
      s""""channels":[${channels.map(q).mkString(",")}]}"""
    val resp = c(Seq(Http.Request(
      s"${baseUrl.stripSuffix("/")}/v1/streaming/channels/status",
      "POST", Map("Content-Type" -> "application/json"), body))).head
    val n = mapper.readTree(resp.body)
    import scala.jdk.CollectionConverters._
    n.path("channels").elements().asScala.map { ch =>
      ch.get("channel").asText ->
        Option(ch.get("offset_token")).filterNot(_.isNull).map(_.asText)
    }.toMap
  }

  /** Per-partition channels: open `<prefix>-<pid>`, skip rows whose
    * offset token is ≤ the committed token (restart overlap), write
    * the rest in token-ordered batches. `offsetTokenCol` supplies the
    * per-row token (the output's `offset_token` interpolation);
    * tokens must be lexicographically increasing per partition for
    * the ≤-committed dedupe to be meaningful — zero-padded ordinals
    * are the documented pattern.
    */
  def write(df: DataFrame, baseUrl: String, database: String,
            schema: String, table: String,
            channelPrefix: String = "graft",
            offsetTokenCol: String = "__offset_token",
            batchSize: Int = 512, valueCol: String = "value"): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    val tIdx = df.schema.fieldIndex(offsetTokenCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val c = clientFor(baseUrl)
        val opened = openChannel(baseUrl, c, database, schema, table,
          s"$channelPrefix-$pid")
        val committed = opened.committedOffsetToken
        it.grouped(batchSize).foreach { rows =>
          // client-side dedupe against the committed token — the
          // reference compares before sending (rest.go offset contract)
          val fresh = rows.filter(r =>
            committed.forall(_ < r.getString(tIdx)))
          if (fresh.nonEmpty) {
            writeBlob(baseUrl, c, database, schema, table, opened,
              fresh.map(_.getString(vIdx)),
              fresh.head.getString(tIdx), fresh.last.getString(tIdx))
            ()
          }
        }
      }
    }
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ───────────────────────── in-process service ─────────────────────────

  /** Snowpipe-Streaming-shaped fake: channel registry with
    * client-sequencer fencing, staged blobs, per-channel committed
    * offset tokens with ≤-token dedupe, and table row accumulation at
    * register time.
    */
  final class Service {
    private final case class Ch(var sequencer: Long,
                                var committed: Option[String])
    private val channels = TrieMap.empty[String, Ch]
    private val stage = TrieMap.empty[String, Array[Byte]]
    private val tables = TrieMap.empty[String, Vector[String]]

    def rows(database: String, schema: String, table: String): Vector[String] =
      tables.getOrElse(s"$database.$schema.$table", Vector.empty)

    def committedToken(database: String, schema: String, table: String,
                       channel: String): Option[String] =
      channels.get(s"$database.$schema.$table#$channel")
        .flatMap(_.committed)

    val client: Http.Client = reqs => reqs.map { req =>
      val path = java.net.URI.create(req.url).getPath
      (req.verb, path) match {
        case ("POST", p) if p.endsWith("/channels/open") => open(req)
        case ("POST", p) if p.endsWith("/channels/write/blobs") =>
          register(req)
        case ("POST", p) if p.endsWith("/channels/status") => status(req)
        case ("POST", p) if p.endsWith("/client/configure") =>
          Http.Response(200,
            """{"status_code":0,"prefix":"graft","deployment_id":1}""")
        case ("PUT", p) if p.contains("/stage/") =>
          stage(p.substring(p.indexOf("/stage/") + 7)) = req.bodyBytes
          Http.Response(200, "")
        case other =>
          Http.Response(404, s"""{"status_code":4,"message":"$other"}""")
      }
    }

    private def open(req: Http.Request): Http.Response = {
      val n = Shared.mapper.readTree(req.body)
      val key = s"${n.get("database").asText}.${n.get("schema").asText}" +
        s".${n.get("table").asText}#${n.get("channel").asText}"
      val ch = channels.synchronized {
        val c = channels.getOrElseUpdate(key, Ch(0L, None))
        c.sequencer += 1 // every open fences earlier writers
        c
      }
      val tok = ch.committed.map(q).getOrElse("null")
      Http.Response(200, s"""{"status_code":0,"message":"Success",""" +
        s""""channel":${n.get("channel")},""" +
        s""""client_sequencer":${ch.sequencer},"row_sequencer":0,""" +
        s""""offset_token":$tok,"table_columns":[]}""")
    }

    private def register(req: Http.Request): Http.Response = {
      val n = Shared.mapper.readTree(req.body)
      val blob = n.at("/blobs/0")
      val path = blob.get("path").asText
      val chunk = blob.at("/chunks/0")
      val tableKey = s"${chunk.get("database").asText}" +
        s".${chunk.get("schema").asText}.${chunk.get("table").asText}"
      val chn = chunk.at("/channels/0")
      val key = s"$tableKey#${chn.get("channel").asText}"
      val ch = channels.getOrElse(key,
        return Http.Response(200, chanStatus(chn, 21, "unknown channel")))
      ch.synchronized {
        if (chn.get("client_sequencer").asLong != ch.sequencer)
          Http.Response(200, chanStatus(chn, 20, "wrong sequencer"))
        else {
          val end = chn.get("end_offset_token").asText
          if (ch.committed.exists(end <= _))
            // duplicate of already-committed data
            Http.Response(200, chanStatus(chn, 7, "dedupe"))
          else {
            val data = stage.getOrElse(path,
              return Http.Response(200,
                chanStatus(chn, 22, s"blob $path not staged")))
            val lines = new String(data, "UTF-8").split("\n").toVector
              .filter(_.nonEmpty)
            tables.synchronized {
              tables(tableKey) =
                tables.getOrElse(tableKey, Vector.empty) ++ lines
            }
            ch.committed = Some(end)
            Http.Response(200, chanStatus(chn, 0, "Success"))
          }
        }
      }
    }

    private def chanStatus(chn: com.fasterxml.jackson.databind.JsonNode,
                           code: Int, msg: String): String =
      s"""{"status_code":${if (code == 0) 0 else code},""" +
        s""""message":${q(msg)},"blobs":[{"chunks":[{"channels":[{""" +
        s""""status_code":$code,"message":${q(msg)},""" +
        s""""channel":${chn.get("channel")},""" +
        s""""client_sequencer":${chn.get("client_sequencer")}}]}]}]}"""

    private def status(req: Http.Request): Http.Response = {
      val n = Shared.mapper.readTree(req.body)
      val tableKey = s"${n.get("database").asText}" +
        s".${n.get("schema").asText}.${n.get("table").asText}"
      import scala.jdk.CollectionConverters._
      val chans = n.path("channels").elements().asScala.map { c =>
        val tok = channels.get(s"$tableKey#${c.asText}")
          .flatMap(_.committed).map(q).getOrElse("null")
        s"""{"channel":${c},"offset_token":$tok,"status_code":0}"""
      }.mkString(",")
      Http.Response(200,
        s"""{"status_code":0,"channels":[$chans]}""")
    }
  }
}
