package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.{Dataset, SparkSession}

/** `gcp_spanner_cdc` input (reference
  * internal/impl/gcp/enterprise/input_spanner_cdc.go:1-468 — Spanner
  * change streams via a partition subscriber with per-partition
  * watermarks; the reference rides the Spanner client library, this
  * speaks the PUBLIC REST surface: `sessions` create,
  * `:executeStreamingSql` over the documented change-stream TVF
  * `SELECT ChangeRecord FROM READ_<stream>(start_timestamp,
  * end_timestamp, partition_token, heartbeat_milliseconds)`, and
  * `:commit` mutations; record schema per the Spanner change-stream
  * docs: data_change_record / heartbeat_record /
  * child_partitions_record, INT64 keys JSON-encoded as strings).
  *
  * Semantics kept from input_spanner_cdc.go:
  *  - the ROOT query (NULL partition_token) yields child partition
  *    tokens; data is read per partition
  *  - per-partition WATERMARK advanced by data records AND heartbeats
  *    (onDataChangeRecord → UpdatePartitionWatermark,
  *    input_spanner_cdc.go:224-240), persisted in a JSON checkpoint
  *    standing in for the reference's metadata table; restart resumes
  *    each partition past its watermark — no replay, no loss
  *  - value_capture_type NEW_ROW: new_values carries the full row,
  *    deletes carry keys only
  *
  * Scale shape: partitions fan out across Spark tasks (one HTTP
  * session per task, executor-side); only the root partition
  * discovery and the checkpoint write are driver admission.
  */
object SpannerCdc {

  private def mapper = new ObjectMapper()

  /** One change record row. `modType` ∈ INSERT/UPDATE/DELETE; values
    * are the Spanner JSON encodings (INT64 as strings); `commitTs`
    * is the logical commit timestamp ordering records.
    */
  case class Event(modType: String, table: String, keys: String,
                   newValues: String, oldValues: String, commitTs: Long,
                   recordSequence: String, partitionToken: String)

  // ──────────────────────── checkpoint ────────────────────────

  private def loadWatermarks(path: String): Map[String, Long] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else mapper.readTree(new String(Files.readAllBytes(p), UTF_8))
      .properties().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
  }

  private def storeWatermarks(path: String, wm: Map[String, Long]): Unit = {
    val o = mapper.createObjectNode()
    wm.foreach { case (k, v) => o.put(k, v) }
    Files.write(Paths.get(path), o.toString.getBytes(UTF_8))
    ()
  }

  // ───────────────────────── client ─────────────────────────

  private def post(url: String, token: String, body: String): JsonNode = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Authorization", s"Bearer $token")
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val r = java.net.http.HttpClient.newHttpClient()
      .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (r.statusCode() / 100 != 2)
      throw new IllegalStateException(s"POST $url -> ${r.statusCode()}: ${r.body()}")
    mapper.readTree(r.body())
  }

  private def createSession(baseUrl: String, token: String,
                            database: String): String =
    post(s"$baseUrl/v1/$database/sessions", token, "{}").get("name").asText

  /** One change-stream TVF query over a partition; returns the raw
    * ChangeRecord nodes.
    */
  private def queryPartition(baseUrl: String, token: String, database: String,
                             session: String, stream: String,
                             partitionToken: Option[String],
                             startTs: Long): Seq[JsonNode] = {
    val body = mapper.createObjectNode()
    body.put("sql",
      s"SELECT ChangeRecord FROM READ_$stream(@start_timestamp, " +
        "@end_timestamp, @partition_token, @heartbeat_milliseconds)")
    val params = body.putObject("params")
    params.put("start_timestamp", startTs)
    params.putNull("end_timestamp")
    partitionToken match {
      case Some(t) => params.put("partition_token", t)
      case None => params.putNull("partition_token")
    }
    params.put("heartbeat_milliseconds", 10000)
    val r = post(s"$baseUrl/v1/$database/sessions/$session:executeStreamingSql",
      token, body.toString)
    r.path("rows").elements().asScala.flatMap(_.elements().asScala).toVector
  }

  /** Replay available change records for every partition of `stream`
    * and advance the per-partition watermarks.
    */
  def read(spark: SparkSession, baseUrl: String, token: String,
           database: String, stream: String,
           checkpointPath: Option[String] = None): Dataset[Event] = {
    import spark.implicits._
    val wm = checkpointPath.map(loadWatermarks).getOrElse(Map.empty)
    val session = createSession(baseUrl, token, database)
    // root query: child partition discovery
    val root = queryPartition(baseUrl, token, database, session, stream,
      None, 0L)
    val tokens = root.flatMap { rec =>
      rec.path("child_partitions_record").path("child_partitions")
        .elements().asScala.map(_.get("token").asText)
    }.distinct
    val (b, t, db, st) = (baseUrl, token, database, stream)
    val wmB = wm
    // one Spark task per partition, each over its own session
    val events = spark.createDataset(tokens)
      .repartition(math.max(1, tokens.size))
      .mapPartitions { it =>
        val m = new ObjectMapper()
        it.flatMap { pt =>
          val sess = createSession(b, t, db)
          val recs = queryPartition(b, t, db, sess, st, Some(pt),
            wmB.getOrElse(pt, 0L))
          recs.flatMap { rec =>
            val dcr = rec.get("data_change_record")
            val hb = rec.get("heartbeat_record")
            if (dcr != null && !dcr.isNull)
              dcr.get("mods").elements().asScala.map { mod =>
                def opt(f: String) =
                  if (mod.hasNonNull(f)) mod.get(f).toString else null
                Event(dcr.get("mod_type").asText,
                  dcr.get("table_name").asText,
                  mod.path("keys").toString,
                  opt("new_values"),
                  opt("old_values"),
                  dcr.get("commit_timestamp").asLong,
                  dcr.path("record_sequence").asText,
                  pt)
              }.toVector
            else if (hb != null && !hb.isNull)
              // heartbeats carry no data but advance the watermark
              Vector(Event("HEARTBEAT", null, null, null, null,
                hb.get("timestamp").asLong, "", pt))
            else Vector.empty
          }
        }
      }
    events.persist()
    // watermark = max record/heartbeat timestamp per partition
    checkpointPath.foreach { p =>
      val maxTs = events.groupByKey(_.partitionToken)
        .mapValues(_.commitTs)
        .reduceGroups((a: Long, b2: Long) => math.max(a, b2))
        .collect().toMap
      storeWatermarks(p, wm ++ maxTs)
    }
    events.filter(_.modType != "HEARTBEAT")
  }

  /** Streaming form ([[PollStream]] poller): cursor = the JSON
    * watermark map (partition token → max commit timestamp seen).
    * Each sweep re-discovers partitions from the root query and reads
    * every partition past its watermark — heartbeats advance
    * watermarks without emitting.
    */
  def poller(baseUrl: String, token: String, database: String,
             stream: String): PollStream.Poller = { cursorOpt =>
    val wm = mutable.Map[String, Long]() ++= cursorOpt.map { s =>
      mapper.readTree(s).properties().asScala
        .map(e => e.getKey -> e.getValue.asLong).toMap
    }.getOrElse(Map.empty[String, Long])
    val session = createSession(baseUrl, token, database)
    val tokens = queryPartition(baseUrl, token, database, session, stream,
      None, 0L).flatMap { rec =>
      rec.path("child_partitions_record").path("child_partitions")
        .elements().asScala.map(_.get("token").asText)
    }.distinct
    val out = Vector.newBuilder[PollStream.Payload]
    tokens.foreach { pt =>
      val recs = queryPartition(baseUrl, token, database, session, stream,
        Some(pt), wm.getOrElse(pt, 0L))
      recs.foreach { rec =>
        val dcr = rec.get("data_change_record")
        val hb = rec.get("heartbeat_record")
        if (dcr != null && !dcr.isNull) {
          val ts = dcr.get("commit_timestamp").asLong
          if (ts > wm.getOrElse(pt, 0L)) wm(pt) = ts
          dcr.get("mods").elements().asScala.foreach { mod =>
            out += ((mod.toString, Map(
              "operation" -> dcr.get("mod_type").asText,
              "table" -> dcr.get("table_name").asText,
              "commit_timestamp" -> ts.toString,
              "partition_token" -> pt)))
          }
        } else if (hb != null && !hb.isNull) {
          val ts = hb.get("timestamp").asLong
          if (ts > wm.getOrElse(pt, 0L)) wm(pt) = ts
        }
      }
    }
    val o = mapper.createObjectNode()
    wm.foreach { case (k, v) => o.put(k, v) }
    (out.result(), Some(o.toString))
  }

  // ──────────────────────── loopback server ────────────────────────

  /** Loopback Spanner: sessions + commit mutations + the change-stream
    * TVF, bearer-authed. Change records partition by key hash across
    * `partitions` tokens; every partition's result ends with a
    * heartbeat at the current commit counter so idle partitions still
    * advance their watermark.
    */
  final class Server(authToken: String = "spanner-token",
                     partitions: Int = 3) {
    private val m = new ObjectMapper()
    private val tables =
      mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, ObjectNode]]
    private final case class Change(token: String, record: ObjectNode)
    private val changes = mutable.ArrayBuffer.empty[Change]
    private val commitCounter = new java.util.concurrent.atomic.AtomicLong(0)
    private val sessions = new java.util.concurrent.atomic.AtomicLong(0)

    private val server = JdkHttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val th = new Thread(r, "spanner-api"); th.setDaemon(true); th
      })
    server.setExecutor(pool)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.start()
    def port: Int = server.getAddress.getPort
    def baseUrl: String = s"http://127.0.0.1:$port"
    def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }

    private def tokenOf(key: String): String =
      s"p${math.abs(key.hashCode) % partitions}"

    private def route(ex: HttpExchange): Unit = {
      try {
        val path = ex.getRequestURI.getPath
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val (status, resp): (Int, String) =
          if (!auth.contains(s"Bearer $authToken"))
            (401, """{"error":{"message":"unauthenticated"}}""")
          else
            try handle(path, body)
            catch {
              case e: IllegalArgumentException =>
                (400, s"""{"error":{"message":"${e.getMessage}"}}""")
            }
        val bytes = resp.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
      } finally ex.close()
    }

    private def handle(path: String, body: String): (Int, String) =
      if (path.endsWith("/sessions"))
        (200, s"""{"name":"sessions/s${sessions.incrementAndGet()}"}""")
      else if (path.endsWith(":executeStreamingSql"))
        (200, executeSql(m.readTree(body)).toString)
      else if (path.endsWith(":commit"))
        (200, commit(m.readTree(body)).toString)
      else (404, s"""{"error":{"message":"no route: $path"}}""")

    // ── commit mutations (the public shapes: insert / update /
    //    insertOrUpdate / delete) → change records ──
    private def commit(body: JsonNode): ObjectNode = synchronized {
      val ts = commitCounter.incrementAndGet()
      var seq = 0
      body.path("mutations").elements().asScala.foreach { mut =>
        val (op, spec) = mut.properties().asScala.headOption
          .map(e => (e.getKey, e.getValue))
          .getOrElse(throw new IllegalArgumentException("empty mutation"))
        op match {
          case "insert" | "update" | "insertOrUpdate" =>
            val table = spec.get("table").asText
            val cols = spec.get("columns").elements().asScala
              .map(_.asText).toVector
            spec.get("values").elements().asScala.foreach { vals =>
              val row = m.createObjectNode()
              cols.zipWithIndex.foreach { case (c, i) =>
                row.set[JsonNode](c, vals.get(i))
              }
              val key = row.get(cols.head).asText
              val rows = tables.getOrElseUpdate(table,
                mutable.LinkedHashMap.empty)
              val old = rows.get(key)
              if (op == "insert" && old.isDefined)
                throw new IllegalArgumentException(s"ALREADY_EXISTS: $key")
              if (op == "update" && old.isEmpty)
                throw new IllegalArgumentException(s"NOT_FOUND: $key")
              rows(key) = row
              record(table, cols.head, key,
                if (old.isDefined) "UPDATE" else "INSERT",
                Some(row), old, ts, seq)
              seq += 1
            }
          case "delete" =>
            val table = spec.get("table").asText
            spec.at("/keySet/keys").elements().asScala.foreach { keyArr =>
              val key = keyArr.get(0).asText
              tables.get(table).flatMap(_.remove(key)).foreach { old =>
                val keyCol = old.properties().asScala.head.getKey
                record(table, keyCol, key, "DELETE", None, Some(old), ts, seq)
                seq += 1
              }
            }
          case other =>
            throw new IllegalArgumentException(s"unsupported mutation: $other")
        }
      }
      val o = m.createObjectNode()
      o.put("commitTimestamp", ts)
      o
    }

    private def record(table: String, keyCol: String, key: String,
                       modType: String, nu: Option[ObjectNode],
                       old: Option[ObjectNode], ts: Long, seq: Int): Unit = {
      val dcr = m.createObjectNode()
      dcr.put("commit_timestamp", ts)
      dcr.put("record_sequence", s"$ts-$seq")
      dcr.put("table_name", table)
      dcr.put("mod_type", modType)
      dcr.put("value_capture_type", "NEW_ROW")
      val mod = dcr.putArray("mods").addObject()
      val keys = mod.putObject("keys")
      nu.orElse(old).foreach(r => keys.set[JsonNode](keyCol, r.get(keyCol)))
      nu.foreach(r => { mod.set[JsonNode]("new_values", r.deepCopy()); () })
      old.foreach(r => { mod.set[JsonNode]("old_values", r.deepCopy()); () })
      val rec = m.createObjectNode()
      rec.set[JsonNode]("data_change_record", dcr)
      changes += Change(tokenOf(key), rec)
      ()
    }

    // ── the change-stream TVF ──
    private def executeSql(body: JsonNode): ObjectNode = synchronized {
      val sql = body.path("sql").asText
      if (!sql.contains("FROM READ_"))
        throw new IllegalArgumentException(s"unsupported sql: $sql")
      val params = body.path("params")
      val pt = Option(params.get("partition_token")).filterNot(_.isNull)
        .map(_.asText)
      val startTs = params.path("start_timestamp").asLong(0)
      val o = m.createObjectNode()
      val rows = o.putArray("rows")
      def addRow(rec: JsonNode): Unit = {
        val r = rows.addArray(); r.add(rec); ()
      }
      pt match {
        case None =>
          // root partition: child partition discovery
          val rec = m.createObjectNode()
          val cpr = rec.putObject("child_partitions_record")
          cpr.put("start_timestamp", startTs)
          val arr = cpr.putArray("child_partitions")
          (0 until partitions).foreach { i =>
            val c = arr.addObject()
            c.put("token", s"p$i")
            c.putArray("parent_partition_tokens")
            ()
          }
          addRow(rec)
        case Some(token) =>
          changes.iterator
            .filter(c => c.token == token &&
              c.record.at("/data_change_record/commit_timestamp").asLong > startTs)
            .foreach(c => addRow(c.record))
          // trailing heartbeat: idle partitions still advance
          val hb = m.createObjectNode()
          hb.putObject("heartbeat_record")
            .put("timestamp", commitCounter.get)
          addRow(hb)
      }
      o
    }
  }
}
