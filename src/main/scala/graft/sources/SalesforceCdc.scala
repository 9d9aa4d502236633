package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expressions.CodecOps

/** `salesforce_cdc` input (reference
  * internal/impl/salesforce/salesforcegrpc/{client,subscription}.go —
  * the Salesforce Pub/Sub API: a gRPC Subscribe stream of
  * AVRO-encoded Change Data Capture events with replay-id resume; the
  * reference rides generated pb stubs over the official proto —
  * contract only). This speaks the PUBLIC eventbus.v1 shapes over the
  * repo's h2c gRPC stack:
  *
  *  - `/eventbus.v1.PubSub/Subscribe`: FetchRequest{topic_name,
  *    replay_preset LATEST|EARLIEST|CUSTOM, replay_id, num_requested}
  *    → FetchResponse{events[] ConsumerEvent{ProducerEvent{id,
  *    schema_id, payload avro}, replay_id}, latest_replay_id} —
  *    events batched into multiple responses on one stream, flow
  *    bounded by num_requested (subscription.go:97-235)
  *  - `/eventbus.v1.PubSub/GetSchema`: schema_id → Avro schema JSON,
  *    cached client-side (the reference's schemaCache)
  *  - auth = the documented `accesstoken`/`instanceurl`/`tenantid`
  *    gRPC metadata, enforced server-side (grpc-status 16)
  *
  * Event payloads are REAL Avro binary (the repo's CodecOps codec):
  * a CDC record with ChangeEventHeader{entityName, changeType,
  * recordIds} + typed fields. The newest consumed replay id persists
  * in a checkpoint file; the next read resumes with preset CUSTOM —
  * subscription.go:102-104.
  *
  * Scale shape: one subscribe stream (the protocol is one ordered
  * stream per topic, same as the reference); Avro payload decode and
  * downstream folds parallelize.
  */
object SalesforceCdc {

  /** One decoded CDC event. */
  case class Event(changeType: String, entity: String, recordId: String,
                   payloadJson: String, schemaId: String, replayId: Long)

  private def mapper = new ObjectMapper()

  val PresetLatest = 0; val PresetEarliest = 1; val PresetCustom = 2

  // ─────────────────────── proto3 wire helpers ───────────────────────

  private def varint(bos: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
  }
  private def lenField(bos: ByteArrayOutputStream, num: Int,
                       b: Array[Byte]): Unit = {
    varint(bos, (num.toLong << 3) | 2); varint(bos, b.length); bos.write(b)
  }
  private def strField(bos: ByteArrayOutputStream, num: Int,
                       s: String): Unit =
    if (s != null && s.nonEmpty) lenField(bos, num, s.getBytes(UTF_8))
  private def intField(bos: ByteArrayOutputStream, num: Int,
                       v: Long): Unit =
    if (v != 0) { varint(bos, (num.toLong << 3) | 0); varint(bos, v) }
  private def msg(build: ByteArrayOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); build(bos); bos.toByteArray
  }

  private final class Reader(b: Array[Byte]) {
    private var i = 0
    def hasNext: Boolean = i < b.length
    def readVarint(): Long = {
      var v = 0L; var shift = 0; var x = 0
      do { x = b(i) & 0xff; i += 1; v |= (x & 0x7fL) << shift; shift += 7 }
      while ((x & 0x80) != 0)
      v
    }
    def readTag(): (Int, Int) = {
      val t = readVarint(); ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(b, i, i + n); i += n; out
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => i += 8
      case 2 => readBytes(); ()
      case 5 => i += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  // ───────────────────── eventbus.v1 message codec ─────────────────────

  def encodeFetchRequest(topic: String, preset: Int, replayId: Long,
                         numRequested: Int): Array[Byte] = msg { b =>
    strField(b, 1, topic)
    intField(b, 2, preset.toLong)
    if (preset == PresetCustom)
      lenField(b, 3, replayIdBytes(replayId))
    intField(b, 4, numRequested.toLong)
  }

  /** Replay ids are opaque bytes on the wire; ours are big-endian
    * longs (real Salesforce ids are similar monotonic tokens).
    */
  def replayIdBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
  def replayIdOf(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).getLong

  def decodeFetchRequest(bytes: Array[Byte]): (String, Int, Long, Int) = {
    val r = new Reader(bytes)
    var topic = ""; var preset = 0; var replay = 0L; var n = 0
    while (r.hasNext) r.readTag() match {
      case (1, 2) => topic = new String(r.readBytes(), UTF_8)
      case (2, 0) => preset = r.readVarint().toInt
      case (3, 2) => replay = replayIdOf(r.readBytes())
      case (4, 0) => n = r.readVarint().toInt
      case (_, w) => r.skip(w)
    }
    (topic, preset, replay, n)
  }

  def encodeFetchResponse(events: Seq[(String, String, Array[Byte], Long)],
                          latestReplayId: Long): Array[Byte] = msg { b =>
    events.foreach { case (id, schemaId, payload, replayId) =>
      val producer = msg { pb =>
        strField(pb, 1, id); strField(pb, 2, schemaId)
        lenField(pb, 3, payload)
      }
      lenField(b, 1, msg { cb =>
        lenField(cb, 1, producer)
        lenField(cb, 2, replayIdBytes(replayId))
      })
    }
    lenField(b, 2, replayIdBytes(latestReplayId))
  }

  /** → (events(id, schemaId, payload, replayId), latestReplayId). */
  def decodeFetchResponse(bytes: Array[Byte])
      : (Vector[(String, String, Array[Byte], Long)], Long) = {
    val r = new Reader(bytes)
    val evs = Vector.newBuilder[(String, String, Array[Byte], Long)]
    var latest = 0L
    while (r.hasNext) r.readTag() match {
      case (1, 2) =>
        val cr = new Reader(r.readBytes())
        var id = ""; var schemaId = ""
        var payload = Array.empty[Byte]; var replay = 0L
        while (cr.hasNext) cr.readTag() match {
          case (1, 2) =>
            val pr = new Reader(cr.readBytes())
            while (pr.hasNext) pr.readTag() match {
              case (1, 2) => id = new String(pr.readBytes(), UTF_8)
              case (2, 2) => schemaId = new String(pr.readBytes(), UTF_8)
              case (3, 2) => payload = pr.readBytes()
              case (_, w) => pr.skip(w)
            }
          case (2, 2) => replay = replayIdOf(cr.readBytes())
          case (_, w) => cr.skip(w)
        }
        evs += ((id, schemaId, payload, replay))
      case (2, 2) => latest = replayIdOf(r.readBytes())
      case (_, w) => r.skip(w)
    }
    (evs.result(), latest)
  }

  def encodeSchemaRequest(schemaId: String): Array[Byte] =
    msg(strField(_, 1, schemaId))
  def decodeSchemaRequest(bytes: Array[Byte]): String = {
    val r = new Reader(bytes)
    var id = ""
    while (r.hasNext) r.readTag() match {
      case (1, 2) => id = new String(r.readBytes(), UTF_8)
      case (_, w) => r.skip(w)
    }
    id
  }
  def encodeSchemaInfo(schemaJson: String, schemaId: String): Array[Byte] =
    msg { b => strField(b, 1, schemaJson); strField(b, 3, schemaId) }
  def decodeSchemaInfo(bytes: Array[Byte]): String = {
    val r = new Reader(bytes)
    var json = ""
    while (r.hasNext) r.readTag() match {
      case (1, 2) => json = new String(r.readBytes(), UTF_8)
      case (_, w) => r.skip(w)
    }
    json
  }

  // ─────────────────────────── input ───────────────────────────

  case class Auth(accessToken: String, instanceUrl: String, tenantId: String)

  private def grpcCall(host: String, port: Int, auth: Auth, path: String,
                       request: Array[Byte]): Array[Byte] = {
    val ep = Http2.connect(host, port)
    try {
      ep.sendMessage(Seq(
        ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
        ":authority" -> s"$host:$port",
        "content-type" -> "application/grpc", "te" -> "trailers",
        "accesstoken" -> auth.accessToken,
        "instanceurl" -> auth.instanceUrl,
        "tenantid" -> auth.tenantId),
        OtlpGrpc.grpcFrame(request))
      val (_, headers, body, trailers) = ep.readMessage()
      val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
      if (status != "0")
        throw new IllegalStateException(s"salesforce_cdc: grpc-status " +
          s"$status ${(trailers ++ headers).toMap.getOrElse("grpc-message", "")}")
      body
    } finally ep.close()
  }

  private def frames(body: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var off = 0
    while (off < body.length) {
      val len = java.nio.ByteBuffer.wrap(body, off + 1, 4).getInt
      out += java.util.Arrays.copyOfRange(body, off + 5, off + 5 + len)
      off += 5 + len
    }
    out.result()
  }

  /** How many admission chunks the last [[read]] spilled (1 = the
    * in-memory fast path) — test-only observable.
    */
  private[sources] var lastAdmissionChunks: Int = 0

  /** One bounded Subscribe replay for `topic`. Preset precedence
    * mirrors subscription.go: cached replay id → CUSTOM; else the
    * given `preset` (EARLIEST replays everything, LATEST from now).
    *
    * BOUNDED ADMISSION: FetchResponses decode incrementally as h2c
    * DATA frames arrive, and at most `admitChunk` decoded events stay
    * driver-resident — an EARLIEST backfill is O(admitChunk) heap.
    */
  def read(spark: SparkSession, host: String, port: Int, auth: Auth,
           topic: String, checkpointPath: Option[String] = None,
           preset: Int = PresetEarliest,
           numRequested: Int = 10000,
           admitChunk: Int = 50000): Dataset[Event] = {
    import spark.implicits._
    val cached = checkpointPath.map(Paths.get(_)).filter(Files.exists(_))
      .map(p => new String(Files.readAllBytes(p), UTF_8).trim)
      .filter(_.nonEmpty).map(_.toLong)
    val req = cached match {
      case Some(r) => encodeFetchRequest(topic, PresetCustom, r, numRequested)
      case None => encodeFetchRequest(topic, preset, 0L, numRequested)
    }
    val schemaCache = mutable.Map[String, String]()
    def schemaOf(id: String): String =
      schemaCache.getOrElseUpdate(id, decodeSchemaInfo(
        frames(grpcCall(host, port, auth, "/eventbus.v1.PubSub/GetSchema",
          encodeSchemaRequest(id))).head))
    var latest = cached.getOrElse(0L)
    val buf = mutable.Buffer[Event]()
    var spillBase: String = null
    var chunks = 0
    def flush(): Unit = if (buf.nonEmpty) {
      if (spillBase == null) {
        val d = Files.createTempDirectory("sfdc_admit_")
        d.toFile.deleteOnExit()
        spillBase = d.toString
      }
      spark.createDataset(buf.toSeq).write.mode("append").parquet(spillBase)
      chunks += 1
      buf.clear()
    }
    val splitter = new OtlpGrpc.GrpcFrameSplitter(f => {
      val (evs, lat) = decodeFetchResponse(f)
      if (lat > latest) latest = lat
      evs.foreach { case (_, schemaId, payload, replayId) =>
        if (replayId > latest) latest = replayId
        // REAL avro decode through the engine's codec
        val json = mapper.readTree(CodecOps.avroDecode(payload,
          schemaOf(schemaId)).toString)
        val header = json.path("ChangeEventHeader")
        val recordId = {
          val ids = header.path("recordIds")
          if (ids.size > 0) ids.get(0).asText else ""
        }
        val payloadJson = {
          val o = json.deepCopy[ObjectNode]()
          o.remove("ChangeEventHeader")
          o.toString
        }
        buf += Event(header.path("changeType").asText,
          header.path("entityName").asText, recordId, payloadJson,
          schemaId, replayId)
        if (buf.size >= admitChunk) flush()
      }
    })
    val ep = Http2.connect(host, port)
    try {
      ep.sendMessage(Seq(
        ":method" -> "POST", ":scheme" -> "http",
        ":path" -> "/eventbus.v1.PubSub/Subscribe",
        ":authority" -> s"$host:$port",
        "content-type" -> "application/grpc", "te" -> "trailers",
        "accesstoken" -> auth.accessToken,
        "instanceurl" -> auth.instanceUrl,
        "tenantid" -> auth.tenantId),
        OtlpGrpc.grpcFrame(req))
      val (_, headers, trailers) = ep.readMessageStreaming(splitter.feed)
      val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
      if (status != "0")
        throw new IllegalStateException(s"salesforce_cdc: grpc-status " +
          s"$status ${(trailers ++ headers).toMap.getOrElse("grpc-message", "")}")
      splitter.finish()
    } finally ep.close()
    checkpointPath.foreach(p =>
      Files.write(Paths.get(p), latest.toString.getBytes(UTF_8)))
    val out =
      if (chunks == 0) spark.createDataset(buf.toSeq)
      else { flush(); spark.read.parquet(spillBase).as[Event] }
    lastAdmissionChunks = math.max(1, chunks)
    out
  }

  /** Streaming form ([[PollStream]] poller): cursor = the newest
    * replay id; each sweep fetches exactly the later events (CUSTOM
    * preset), first sweep from `initialPreset`.
    */
  def poller(host: String, port: Int, auth: Auth, topic: String,
             initialPreset: Int = PresetEarliest,
             numRequested: Int = 10000): PollStream.Poller = { cursorOpt =>
    val cursor = cursorOpt.map(_.toLong)
    val req = cursor match {
      case Some(r) => encodeFetchRequest(topic, PresetCustom, r, numRequested)
      case None => encodeFetchRequest(topic, initialPreset, 0L, numRequested)
    }
    val schemaCache = mutable.Map[String, String]()
    def schemaOf(id: String): String =
      schemaCache.getOrElseUpdate(id, decodeSchemaInfo(
        frames(grpcCall(host, port, auth, "/eventbus.v1.PubSub/GetSchema",
          encodeSchemaRequest(id))).head))
    var latest = cursor.getOrElse(0L)
    val out = Vector.newBuilder[PollStream.Payload]
    val splitter = new OtlpGrpc.GrpcFrameSplitter(f => {
      val (evs, lat) = decodeFetchResponse(f)
      if (lat > latest) latest = lat
      evs.foreach { case (_, schemaId, payload, replayId) =>
        if (replayId > latest) latest = replayId
        val json = mapper.readTree(CodecOps.avroDecode(payload,
          schemaOf(schemaId)).toString)
        val header = json.path("ChangeEventHeader")
        out += ((json.toString, Map(
          "operation" -> header.path("changeType").asText,
          "entity" -> header.path("entityName").asText,
          "replay_id" -> replayId.toString,
          "schema_id" -> schemaId)))
      }
    })
    val ep = Http2.connect(host, port)
    try {
      ep.sendMessage(Seq(
        ":method" -> "POST", ":scheme" -> "http",
        ":path" -> "/eventbus.v1.PubSub/Subscribe",
        ":authority" -> s"$host:$port",
        "content-type" -> "application/grpc", "te" -> "trailers",
        "accesstoken" -> auth.accessToken,
        "instanceurl" -> auth.instanceUrl,
        "tenantid" -> auth.tenantId),
        OtlpGrpc.grpcFrame(req))
      val (_, headers, trailers) = ep.readMessageStreaming(splitter.feed)
      val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
      if (status != "0")
        throw new IllegalStateException(
          s"salesforce_cdc poll: grpc-status $status")
      splitter.finish()
    } finally ep.close()
    (out.result(), Some(latest.toString))
  }

  // ─────────────────────────── server ───────────────────────────

  /** Loopback Pub/Sub API over real h2c sockets: metadata auth,
    * replay-preset semantics, Avro-encoded payloads, events chunked
    * into FetchResponses of ≤ `batchPerResponse`, num_requested
    * honored.
    */
  final class Server(auth: Auth, batchPerResponse: Int = 100) {
    private val m = new ObjectMapper()
    private final case class Stored(topic: String, schemaId: String,
                                    payload: Array[Byte], replayId: Long)
    private val log = mutable.ArrayBuffer.empty[Stored]
    private val schemas = mutable.LinkedHashMap.empty[String, String]
    private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0)

    def registerSchema(schemaId: String, avroJson: String): Unit =
      log.synchronized { schemas(schemaId) = avroJson; () }

    /** Publish one CDC event: the payload JSON is Avro-encoded with
      * the topic's registered schema.
      */
    def publish(topic: String, schemaId: String, entity: String,
                changeType: String, recordId: String,
                fields: String): Long = log.synchronized {
      val schema = schemas.getOrElse(schemaId,
        throw new IllegalArgumentException(s"schema $schemaId unknown"))
      val doc = m.createObjectNode()
      val header = doc.putObject("ChangeEventHeader")
      header.put("entityName", entity)
      header.put("changeType", changeType)
      val ids = header.putArray("recordIds"); ids.add(recordId)
      m.readTree(fields).properties().forEach(e =>
        doc.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue))
      val payload = CodecOps.avroEncode(
        UTF8String.fromString(doc.toString), schema)
      val rid = replaySeq.incrementAndGet()
      log += Stored(topic, schemaId, payload, rid)
      rid
    }

    private val inner = new Http2.Server(endpoint => {
      var open = true
      while (open) {
        try {
          val (sid, headers, body, _) = endpoint.readMessage()
          val h = headers.toMap
          def respond(payload: Array[Byte], status: String,
                      message: String = ""): Unit = {
            endpoint.sendMessage(
              Seq(":status" -> "200", "content-type" -> "application/grpc"),
              payload,
              Seq("grpc-status" -> status) ++
                (if (message.nonEmpty) Seq("grpc-message" -> message)
                 else Nil),
              stream = sid)
            ()
          }
          val authOk = h.get("accesstoken").contains(auth.accessToken) &&
            h.get("instanceurl").contains(auth.instanceUrl) &&
            h.get("tenantid").contains(auth.tenantId)
          if (!authOk) respond(Array.empty, "16", "invalid auth metadata")
          else h.getOrElse(":path", "") match {
            case "/eventbus.v1.PubSub/GetSchema" =>
              val id = decodeSchemaRequest(OtlpGrpc.parseGrpcFrame(body))
              log.synchronized(schemas.get(id)) match {
                case Some(json) => respond(
                  OtlpGrpc.grpcFrame(encodeSchemaInfo(json, id)), "0")
                case None => respond(Array.empty, "5", s"schema $id")
              }
            case "/eventbus.v1.PubSub/Subscribe" =>
              val (topic, preset, replay, numReq) =
                decodeFetchRequest(OtlpGrpc.parseGrpcFrame(body))
              val after = preset match {
                case PresetEarliest => 0L
                case PresetCustom => replay
                case _ => replaySeq.get // LATEST
              }
              val pending = log.synchronized(
                log.filter(s => s.topic == topic && s.replayId > after)
                  .take(math.max(0, numReq)).toVector)
              val top = replaySeq.get
              val payload = pending.grouped(batchPerResponse).map { grp =>
                OtlpGrpc.grpcFrame(encodeFetchResponse(
                  grp.map(s => (s"e${s.replayId}", s.schemaId, s.payload,
                    s.replayId)),
                  grp.last.replayId))
              }.foldLeft(Array.empty[Byte])(_ ++ _)
              val withKeepalive =
                if (pending.nonEmpty) payload
                // empty sweep: latest_replay_id still advances (the
                // keepalive FetchResponse the real API sends)
                else OtlpGrpc.grpcFrame(encodeFetchResponse(Nil, top))
              respond(withKeepalive, "0")
            case other => respond(Array.empty, "12", s"unknown $other")
          }
        } catch {
          case _: java.io.EOFException => open = false
          case _: Exception => open = false
        }
      }
    })

    def port: Int = inner.port
    def stop(): Unit = inner.stop()
  }
}
