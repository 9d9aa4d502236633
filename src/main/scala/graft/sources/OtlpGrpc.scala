package graft.sources

import java.io.EOFException

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** OTLP/gRPC — the gRPC half of the OTLP pair (reference
  * `internal/impl/otlp/input_grpc.go`; the HTTP half is
  * [[Otlp.HttpServer]]): gRPC carried over the [[Http2]] h2c stack,
  * with the collector Export methods of
  * `opentelemetry.proto.collector.{trace,logs,metrics}.v1`.
  *
  * gRPC layering (the PUBLIC protocol): each call is one HTTP/2
  * stream — request HEADERS (`:method: POST`, `:path` = the service
  * method, `content-type: application/grpc`, `te: trailers`), DATA
  * carrying length-prefixed messages (1-byte compressed flag + 4-byte
  * big-endian length + protobuf bytes), response HEADERS + DATA +
  * TRAILERS with `grpc-status` (0 = OK, 3 = INVALID_ARGUMENT on an
  * undecodable body). The protobuf payloads are the same
  * opentelemetry-proto request messages the HTTP half speaks, decoded
  * by the same descriptor codec ([[Otlp.parseRequest]]).
  */
object OtlpGrpc {

  def servicePath(signal: String): String = signal match {
    case "trace" =>
      "/opentelemetry.proto.collector.trace.v1.TraceService/Export"
    case "log" =>
      "/opentelemetry.proto.collector.logs.v1.LogsService/Export"
    case "metric" =>
      "/opentelemetry.proto.collector.metrics.v1.MetricsService/Export"
    case other => throw new IllegalArgumentException(s"signal: $other")
  }

  private def signalOf(path: String): Option[String] = path match {
    case p if p.contains(".trace.") => Some("trace")
    case p if p.contains(".logs.") => Some("log")
    case p if p.contains(".metrics.") => Some("metric")
    case _ => None
  }

  /** Length-prefixed gRPC message framing (§ protocol: Length-Prefixed
    * Message): compressed flag 0 + u32 BE length + data.
    */
  def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(0) = 0
    out(1) = (msg.length >> 24).toByte; out(2) = (msg.length >> 16).toByte
    out(3) = (msg.length >> 8).toByte; out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  /** Incremental gRPC length-prefixed frame splitter: messages may
    * straddle HTTP/2 DATA frame boundaries, so [[feed]] buffers only
    * the current INCOMPLETE message and emits each complete one —
    * O(largest message) memory over an arbitrarily long stream.
    */
  final class GrpcFrameSplitter(onMessage: Array[Byte] => Unit) {
    private val pending = new java.io.ByteArrayOutputStream()
    def feed(data: Array[Byte]): Unit = {
      pending.write(data)
      var buf = pending.toByteArray
      var off = 0
      while (buf.length - off >= 5) {
        require(buf(off) == 0, "grpc: compressed messages unsupported here")
        val len = ((buf(off + 1) & 0xff) << 24) |
          ((buf(off + 2) & 0xff) << 16) |
          ((buf(off + 3) & 0xff) << 8) | (buf(off + 4) & 0xff)
        if (buf.length - off - 5 < len) {
          // incomplete: keep the tail, drop the consumed prefix
          pending.reset()
          pending.write(buf, off, buf.length - off)
          return
        }
        onMessage(java.util.Arrays.copyOfRange(buf, off + 5, off + 5 + len))
        off += 5 + len
      }
      pending.reset()
      if (off < buf.length) pending.write(buf, off, buf.length - off)
      buf = null
    }
    def finish(): Unit =
      require(pending.size() == 0,
        s"grpc: ${pending.size()} trailing bytes after the last message")
  }

  def parseGrpcFrame(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 5, "grpc: truncated length-prefixed message")
    require(data(0) == 0, "grpc: compressed messages unsupported here")
    val len = ((data(1) & 0xff) << 24) | ((data(2) & 0xff) << 16) |
      ((data(3) & 0xff) << 8) | (data(4) & 0xff)
    require(data.length == 5 + len, "grpc: frame length mismatch")
    java.util.Arrays.copyOfRange(data, 5, data.length)
  }

  // ───────────────────────── receiver ─────────────────────────

  /** otlp_grpc INPUT: an h2c gRPC collector accepting Export calls on
    * all three services; undecodable bodies answer grpc-status 3,
    * wrong methods 12 (UNIMPLEMENTED). Drain feeds [[Otlp.unbatchDf]]
    * exactly like the HTTP receiver.
    */
  final class GrpcServer {
    private val received =
      ArrayBuffer.empty[(String, String, Array[Byte])]

    private val inner = new Http2.Server(endpoint => {
      var open = true
      while (open) {
        try {
          val (sid, headers, body, _) = endpoint.readMessage()
          val h = headers.toMap
          val path = h.getOrElse(":path", "")
          require(h.get("content-type").exists(
            _.startsWith("application/grpc")), "grpc: bad content-type")
          signalOf(path) match {
            case None =>
              endpoint.sendMessage(
                Seq(":status" -> "200",
                  "content-type" -> "application/grpc"),
                Array.empty,
                Seq("grpc-status" -> "12",
                  "grpc-message" -> s"unknown method $path"),
                stream = sid)
            case Some(signal) =>
              val (status, msg) =
                try {
                  val proto = parseGrpcFrame(body)
                  Otlp.parseRequest(signal, "protobuf", proto)
                  received.synchronized {
                    received += ((signal, "protobuf", proto)); ()
                  }
                  ("0", "")
                } catch {
                  case e: Exception =>
                    ("3", Option(e.getMessage).getOrElse("bad request"))
                }
              endpoint.sendMessage(
                Seq(":status" -> "200",
                  "content-type" -> "application/grpc"),
                grpcFrame(Array.empty), // empty Export*ServiceResponse
                Seq("grpc-status" -> status) ++
                  (if (msg.nonEmpty) Seq("grpc-message" -> msg)
                   else Seq.empty),
                stream = sid)
          }
        } catch {
          case _: EOFException => open = false
          case _: Exception => open = false
        }
      }
    })

    def port: Int = inner.port

    def receivedCount: Int = received.synchronized(received.size)

    /** Rows (`signal, encoding, body, __seq`) — [[Otlp.unbatchDf]]'s
      * input shape, identical to the HTTP receiver's drain.
      */
    def drain(spark: SparkSession): DataFrame = {
      import org.apache.spark.sql.types._
      val snapshot = received.synchronized(received.toVector)
      val rows = snapshot.zipWithIndex.map { case ((s, e, b), i) =>
        Row(s, e, b, i.toLong)
      }
      val schema = StructType(Seq(
        StructField("signal", StringType),
        StructField("encoding", StringType),
        StructField("body", BinaryType),
        StructField("__seq", LongType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows,
          math.max(1, math.min(math.max(rows.size, 1),
            spark.sparkContext.defaultParallelism))), schema)
    }

    GrpcServer.servers.put(s"127.0.0.1:$port", this)
    def stop(): Unit = {
      inner.stop()
      GrpcServer.servers.remove(s"127.0.0.1:$port"); ()
    }
  }

  object GrpcServer {
    /** Live collectors by `host:port` — the config-form seam: an
      * `otlp_grpc` input's `address` resolves to the running server,
      * whose accepted exports the bounded run drains.
      */
    private[sources] val servers =
      new java.util.concurrent.ConcurrentHashMap[String, GrpcServer]()
    def serverAt(address: String): Option[GrpcServer] =
      Option(servers.get(address))
  }

  // ───────────────────────── exporter ─────────────────────────

  /** otlp_grpc OUTPUT: envelope rows re-grouped executor-side (the
    * [[Otlp.rebatch]] collapse) and exported as one gRPC Export call
    * per batch over a per-partition h2c connection; non-zero
    * grpc-status fails loudly.
    */
  def export(df: DataFrame, host: String, port: Int,
             batchSize: Int = 512): Unit = {
    val vIdx = df.schema.fieldIndex("value")
    val mIdx = df.schema.fieldIndex("metadata")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val ep = Http2.connect(host, port)
        try {
          it.grouped(batchSize).foreach { rows =>
            rows.groupBy(r => r.getMap[String, String](mIdx)
              .getOrElse("otel_signal_type", "trace"))
              .foreach { case (signal, group) =>
                val req = Otlp.rebatch(signal,
                  group.map(_.getString(vIdx)))
                val proto = Otlp.encodeRequest(signal, req.toString)
                ep.sendMessage(Seq(
                  ":method" -> "POST", ":scheme" -> "http",
                  ":path" -> servicePath(signal),
                  ":authority" -> s"$host:$port",
                  "content-type" -> "application/grpc",
                  "te" -> "trailers"), grpcFrame(proto))
                val (_, headers, _, trailers) = ep.readMessage()
                val status = (trailers ++ headers).toMap
                  .getOrElse("grpc-status", "?")
                if (status != "0")
                  throw new IllegalStateException(
                    s"otlp_grpc export: grpc-status $status")
              }
          }
        } finally ep.close()
      }
    }
  }
}
