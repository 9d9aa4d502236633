package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

/** `spicedb_watch` input (reference
  * internal/impl/spicedb/watch_input.go; config surface
  * inputs/spicedb_watch.adoc — endpoint, bearer_token, cache /
  * cache_key for the last zed token): the authzed WatchService/Watch
  * server-streaming RPC carried as REAL gRPC over the repo's h2c
  * stack ([[Http2]] + [[OtlpGrpc.grpcFrame]] framing), with the
  * PUBLIC authzed.api.v1 proto shapes hand-encoded — WatchRequest
  * (optional_start_cursor ZedToken), WatchResponse (repeated
  * RelationshipUpdate{operation, Relationship{resource ObjectReference,
  * relation, subject SubjectReference}} + changes_through ZedToken).
  * The reference rides authzed-go; contract only, nothing to port.
  *
  * Semantics kept from watch_input.go:152-200: the newest CONSUMED
  * zed token persists in a cache (here a JSON file standing in for the
  * cache resource, default key `authzed.com/spicedb/watch/
  * last_zed_token`); the next read resumes from it; without one the
  * watch starts from "now" (or an explicit `startCursor` for recorded
  * replays). Bearer auth is enforced server-side (grpc-status 16).
  *
  * Scale shape: one streaming RPC (the protocol is a single ordered
  * stream — same as the reference's one Watch call); decoded updates
  * parallelize into the returned Dataset.
  */
object SpiceDb {

  /** One relationship update. `op` ∈ CREATE/TOUCH/DELETE. */
  case class Update(op: String, resourceType: String, resourceId: String,
                    relation: String, subjectType: String, subjectId: String,
                    zedToken: String, seq: Long)

  private val OpNames = Map(1 -> "CREATE", 2 -> "TOUCH", 3 -> "DELETE")
  private val OpNums = OpNames.map(_.swap)

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

  // ─────────────────── authzed.api.v1 message codec ───────────────────

  private def objectRef(t: String, id: String): Array[Byte] = msg { b =>
    strField(b, 1, t); strField(b, 2, id)
  }

  def encodeWatchRequest(cursor: Option[String]): Array[Byte] = msg { b =>
    cursor.foreach(tok => lenField(b, 2, msg(strField(_, 1, tok))))
  }

  def decodeWatchRequestCursor(bytes: Array[Byte]): Option[String] = {
    val r = new Reader(bytes)
    var cursor: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (2, 2) =>
        val zr = new Reader(r.readBytes())
        while (zr.hasNext) zr.readTag() match {
          case (1, 2) => cursor = Some(new String(zr.readBytes(), UTF_8))
          case (_, w) => zr.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    cursor
  }

  def encodeWatchResponse(u: Update): Array[Byte] = msg { b =>
    val relationship = msg { rb =>
      lenField(rb, 1, objectRef(u.resourceType, u.resourceId))
      strField(rb, 2, u.relation)
      lenField(rb, 3, msg(lenField(_, 1, objectRef(u.subjectType, u.subjectId))))
    }
    val update = msg { ub =>
      val op = OpNums(u.op)
      varint(ub, (1L << 3) | 0); varint(ub, op.toLong)
      lenField(ub, 2, relationship)
    }
    lenField(b, 1, update)
    lenField(b, 2, msg(strField(_, 1, u.zedToken)))
  }

  def decodeWatchResponse(bytes: Array[Byte]): (Vector[Update], String) = {
    val r = new Reader(bytes)
    val updates = Vector.newBuilder[Update]
    var token = ""
    while (r.hasNext) r.readTag() match {
      case (1, 2) =>
        var op = 0
        var rt = ""; var rid = ""; var rel = ""; var st = ""; var sid = ""
        val ur = new Reader(r.readBytes())
        while (ur.hasNext) ur.readTag() match {
          case (1, 0) => op = ur.readVarint().toInt
          case (2, 2) =>
            val relr = new Reader(ur.readBytes())
            while (relr.hasNext) relr.readTag() match {
              case (1, 2) =>
                val or = new Reader(relr.readBytes())
                while (or.hasNext) or.readTag() match {
                  case (1, 2) => rt = new String(or.readBytes(), UTF_8)
                  case (2, 2) => rid = new String(or.readBytes(), UTF_8)
                  case (_, w) => or.skip(w)
                }
              case (2, 2) => rel = new String(relr.readBytes(), UTF_8)
              case (3, 2) =>
                val sr = new Reader(relr.readBytes())
                while (sr.hasNext) sr.readTag() match {
                  case (1, 2) =>
                    val or = new Reader(sr.readBytes())
                    while (or.hasNext) or.readTag() match {
                      case (1, 2) => st = new String(or.readBytes(), UTF_8)
                      case (2, 2) => sid = new String(or.readBytes(), UTF_8)
                      case (_, w) => or.skip(w)
                    }
                  case (_, w) => sr.skip(w)
                }
              case (_, w) => relr.skip(w)
            }
          case (_, w) => ur.skip(w)
        }
        updates += Update(OpNames.getOrElse(op, "UNSPECIFIED"),
          rt, rid, rel, st, sid, "", 0L)
      case (2, 2) =>
        val zr = new Reader(r.readBytes())
        while (zr.hasNext) zr.readTag() match {
          case (1, 2) => token = new String(zr.readBytes(), UTF_8)
          case (_, w) => zr.skip(w)
        }
      case (_, w) => r.skip(w)
    }
    (updates.result().map(_.copy(zedToken = token)), token)
  }

  // ─────────────────────────── input ───────────────────────────

  private def loadToken(path: String): Option[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else Option(new String(Files.readAllBytes(p), UTF_8).trim)
      .filter(_.nonEmpty)
  }

  /** How many admission chunks the last [[watch]] spilled (1 = the
    * in-memory fast path) — test-only observable.
    */
  private[sources] var lastAdmissionChunks: Int = 0

  /** One bounded Watch replay: everything available past the cursor.
    * Cursor precedence mirrors watch_input.go: cached token, else
    * `startCursor`, else "now".
    *
    * BOUNDED ADMISSION: WatchResponses decode INCREMENTALLY as h2c
    * DATA frames arrive ([[Http2.Endpoint.readMessageStreaming]] +
    * [[OtlpGrpc.GrpcFrameSplitter]]) and at most `admitChunk` decoded
    * updates stay driver-resident — a backfill-scale watch replay is
    * O(admitChunk) driver heap, not O(stream).
    */
  def watch(spark: SparkSession, host: String, port: Int,
            bearerToken: String, cachePath: Option[String] = None,
            startCursor: Option[String] = None,
            admitChunk: Int = 50000): Dataset[Update] = {
    import spark.implicits._
    val cursor = cachePath.flatMap(loadToken).orElse(startCursor)
    var lastToken = cursor.getOrElse("")
    var frameIdx = 0L
    val buf = mutable.Buffer[Update]()
    var spillBase: String = null
    var chunks = 0
    def flush(): Unit = if (buf.nonEmpty) {
      if (spillBase == null) {
        val d = Files.createTempDirectory("spicedb_admit_")
        d.toFile.deleteOnExit()
        spillBase = d.toString
      }
      spark.createDataset(buf.toSeq).write.mode("append").parquet(spillBase)
      chunks += 1
      buf.clear()
    }
    val splitter = new OtlpGrpc.GrpcFrameSplitter(frame => {
      val (us, tok) = decodeWatchResponse(frame)
      if (tok.nonEmpty) lastToken = tok
      frameIdx += 1
      us.foreach { u =>
        buf += u.copy(seq = frameIdx)
        if (buf.size >= admitChunk) flush()
      }
    })
    val ep = Http2.connect(host, port)
    try {
      ep.sendMessage(Seq(
        ":method" -> "POST", ":scheme" -> "http",
        ":path" -> "/authzed.api.v1.WatchService/Watch",
        ":authority" -> s"$host:$port",
        "content-type" -> "application/grpc",
        "te" -> "trailers",
        "authorization" -> s"Bearer $bearerToken"),
        OtlpGrpc.grpcFrame(encodeWatchRequest(cursor)))
      val (_, headers, trailers) = ep.readMessageStreaming(splitter.feed)
      val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
      if (status != "0")
        throw new IllegalStateException(s"spicedb_watch: grpc-status " +
          s"$status ${(trailers ++ headers).toMap.getOrElse("grpc-message", "")}")
      splitter.finish()
    } finally ep.close()
    cachePath.foreach(p =>
      Files.write(Paths.get(p), lastToken.getBytes(UTF_8)))
    val out =
      if (chunks == 0) spark.createDataset(buf.toSeq)
      else { flush(); spark.read.parquet(spillBase).as[Update] }
    lastAdmissionChunks = math.max(1, chunks)
    out
  }

  /** Streaming form ([[PollStream]] poller): cursor = the newest zed
    * token consumed; each sweep replays exactly the updates past it.
    */
  def poller(host: String, port: Int, bearerToken: String,
             startCursor: Option[String] = None): PollStream.Poller =
    { cursorOpt =>
      val cursor = cursorOpt.orElse(startCursor)
      var lastToken = cursor.getOrElse("")
      val out = Vector.newBuilder[PollStream.Payload]
      val splitter = new OtlpGrpc.GrpcFrameSplitter(frame => {
        val (us, tok) = decodeWatchResponse(frame)
        if (tok.nonEmpty) lastToken = tok
        us.foreach { u =>
          out += ((s"""{"operation":"${u.op}","resource":"${u.resourceType}:${u.resourceId}","relation":"${u.relation}","subject":"${u.subjectType}:${u.subjectId}"}""",
            Map("operation" -> u.op, "zed_token" -> u.zedToken)))
        }
      })
      val ep = Http2.connect(host, port)
      try {
        ep.sendMessage(Seq(
          ":method" -> "POST", ":scheme" -> "http",
          ":path" -> "/authzed.api.v1.WatchService/Watch",
          ":authority" -> s"$host:$port",
          "content-type" -> "application/grpc", "te" -> "trailers",
          "authorization" -> s"Bearer $bearerToken"),
          OtlpGrpc.grpcFrame(encodeWatchRequest(cursor)))
        val (_, headers, trailers) = ep.readMessageStreaming(splitter.feed)
        val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
        if (status != "0")
          throw new IllegalStateException(s"spicedb poll: grpc-status $status")
        splitter.finish()
      } finally ep.close()
      (out.result(), if (lastToken.isEmpty) cursorOpt else Some(lastToken))
    }

  // ─────────────────────────── server ───────────────────────────

  /** Loopback SpiceDB speaking the Watch RPC over real h2c sockets:
    * bearer auth (grpc-status 16 without), cursor replay, one
    * WatchResponse per update with its own changes_through token.
    */
  final class Server(bearerToken: String) {
    private val log = mutable.ArrayBuffer.empty[Update]
    private val seq = new java.util.concurrent.atomic.AtomicLong(0)

    def publish(op: String, resourceType: String, resourceId: String,
                relation: String, subjectType: String,
                subjectId: String): Unit = log.synchronized {
      val n = seq.incrementAndGet()
      log += Update(op, resourceType, resourceId, relation, subjectType,
        subjectId, s"zed-$n", n)
      ()
    }

    /** Token "zed-N" → replay strictly after N. Empty → from now. */
    private def afterSeq(cursor: Option[String]): Long = cursor match {
      case Some(t) if t.startsWith("zed-") => t.stripPrefix("zed-").toLong
      case Some("") | None => seq.get
      case Some(other) =>
        throw new IllegalArgumentException(s"bad zed token: $other")
    }

    private val inner = new Http2.Server(endpoint => {
      var open = true
      while (open) {
        try {
          val (sid, headers, body, _) = endpoint.readMessage()
          val h = headers.toMap
          def fail(status: String, msg: String): Unit = {
            endpoint.sendMessage(
              Seq(":status" -> "200", "content-type" -> "application/grpc"),
              Array.empty,
              Seq("grpc-status" -> status, "grpc-message" -> msg),
              stream = sid)
            ()
          }
          if (h.getOrElse(":path", "") != "/authzed.api.v1.WatchService/Watch")
            fail("12", "unknown method")
          else if (!h.get("authorization").contains(s"Bearer $bearerToken"))
            fail("16", "invalid token")
          else {
            val cursor = decodeWatchRequestCursor(
              OtlpGrpc.parseGrpcFrame(body))
            val after = afterSeq(cursor)
            val pending = log.synchronized(log.filter(_.seq > after).toVector)
            val payload = pending.map(u =>
              OtlpGrpc.grpcFrame(encodeWatchResponse(u)))
              .foldLeft(Array.empty[Byte])(_ ++ _)
            endpoint.sendMessage(
              Seq(":status" -> "200", "content-type" -> "application/grpc"),
              payload, Seq("grpc-status" -> "0"), stream = sid)
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
