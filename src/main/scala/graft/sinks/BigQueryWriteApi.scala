package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.{Http2, OtlpGrpc}

/** `gcp_bigquery_write_api` output (reference
  * internal/impl/gcp/enterprise/bigquery/output.go, 1,570 LoC over
  * managedwriter — contract only): the BigQuery STORAGE WRITE API as
  * real gRPC over the repo's h2c stack, with the PUBLIC
  * google.cloud.bigquery.storage.v1 shapes hand-encoded:
  *
  *  - `AppendRows` carrying ProtoData{writer_schema{proto_descriptor
  *    — a real serialized DescriptorProto derived from the table
  *    schema}, rows{serialized_rows}} — JSON messages are converted
  *    to proto rows per that descriptor (message_format: json,
  *    output.go:145-149), int64s accepted as JSON strings
  *    (the protojson rule, output.go:106)
  *  - `default_stream` mode: multiplexed `_default` stream,
  *    at-least-once (output.go:119)
  *  - `pending_stream` mode: a FRESH pending stream per batch, rows
  *    appended at sequential offsets, `FinalizeWriteStream`, then
  *    `BatchCommitWriteStreams` lands the batch atomically —
  *    exactly-once within the committed stream (output.go:120-128);
  *    the loopback refuses appends after finalize and hides
  *    uncommitted rows
  *
  * Scale shape: one gRPC connection per partition batch,
  * executor-side; the per-batch pending-stream lifecycle is the unit
  * the reference multiplexes too.
  */
object BigQueryWriteApi {

  private def mapper = new ObjectMapper()

  // ─────────────────── proto3 wire helpers ───────────────────

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
  private def intField(bos: ByteArrayOutputStream, num: Int, v: Long): Unit =
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
    def readFixed64(): Long = {
      var v = 0L
      (0 until 8).foreach(k => { v |= (b(i + k) & 0xffL) << (8 * k) })
      i += 8; v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => i += 8
      case 2 => readBytes(); ()
      case 5 => i += 4
      case w => throw new IllegalArgumentException(s"wire $w")
    }
  }

  // ───────── DescriptorProto (descriptor.proto, public) ─────────

  /** (name, bq type) — types: STRING/INT64/DOUBLE/BOOL. */
  final case class Field(name: String, tpe: String)

  private val ProtoTypes = Map( // FieldDescriptorProto.Type values
    "DOUBLE" -> 1L, "INT64" -> 3L, "BOOL" -> 8L, "STRING" -> 9L)

  /** A REAL serialized DescriptorProto: 1 name, 2 repeated field
    * {1 name, 3 number, 4 label OPTIONAL(1), 5 type}.
    */
  def descriptorProto(messageName: String, fields: Seq[Field]): Array[Byte] =
    msg { b =>
      strField(b, 1, messageName)
      fields.zipWithIndex.foreach { case (f, i) =>
        lenField(b, 2, msg { fb =>
          strField(fb, 1, f.name)
          intField(fb, 3, i + 1L)
          intField(fb, 4, 1L) // LABEL_OPTIONAL
          intField(fb, 5, ProtoTypes(f.tpe))
        })
      }
    }

  def parseDescriptor(bytes: Array[Byte]): Seq[Field] = {
    val r = new Reader(bytes)
    val fields = mutable.Buffer[(Int, String, Long)]()
    while (r.hasNext) r.readTag() match {
      case (2, 2) =>
        val fr = new Reader(r.readBytes())
        var name = ""; var num = 0; var tpe = 0L
        while (fr.hasNext) fr.readTag() match {
          case (1, 2) => name = new String(fr.readBytes(), UTF_8)
          case (3, 0) => num = fr.readVarint().toInt
          case (5, 0) => tpe = fr.readVarint()
          case (_, w) => fr.skip(w)
        }
        fields += ((num, name, tpe))
      case (_, w) => r.skip(w)
    }
    fields.sortBy(_._1).map { case (_, n, t) =>
      Field(n, ProtoTypes.find(_._2 == t).map(_._1).getOrElse("STRING"))
    }.toSeq
  }

  /** JSON object → serialized proto row per the descriptor. int64
    * accepts JSON strings (the protojson rule).
    */
  def encodeRow(json: JsonNode, fields: Seq[Field]): Array[Byte] = msg { b =>
    fields.zipWithIndex.foreach { case (f, i) =>
      val num = i + 1
      val v = json.get(f.name)
      if (v != null && !v.isNull) f.tpe match {
        case "STRING" => strField(b, num, v.asText)
        case "INT64" => intField(b, num, v.asLong)
        case "BOOL" =>
          if (v.asBoolean) { varint(b, (num.toLong << 3) | 0); b.write(1) }
        case "DOUBLE" =>
          val bits = java.lang.Double.doubleToLongBits(v.asDouble)
          if (bits != 0) {
            varint(b, (num.toLong << 3) | 1)
            (0 until 8).foreach(k => b.write(((bits >>> (8 * k)) & 0xff).toInt))
          }
      }
    }
  }

  /** Absent fields materialize proto3 defaults, so
    * decode(encode(x)) is total (the CodecOps.protoDecode rule).
    */
  def decodeRow(bytes: Array[Byte], fields: Seq[Field]): ObjectNodeT = {
    val o = mapper.createObjectNode()
    fields.foreach { f =>
      f.tpe match {
        case "STRING" => o.put(f.name, "")
        case "INT64" => o.put(f.name, 0L)
        case "BOOL" => o.put(f.name, false)
        case "DOUBLE" => o.put(f.name, 0.0)
      }
      ()
    }
    val r = new Reader(bytes)
    while (r.hasNext) {
      val (num, wire) = r.readTag()
      if (num >= 1 && num <= fields.size) {
        val f = fields(num - 1)
        f.tpe match {
          case "STRING" => o.put(f.name, new String(r.readBytes(), UTF_8))
          case "INT64" => o.put(f.name, r.readVarint())
          case "BOOL" => o.put(f.name, r.readVarint() != 0)
          case "DOUBLE" =>
            o.put(f.name, java.lang.Double.longBitsToDouble(r.readFixed64()))
        }
      } else r.skip(wire)
      ()
    }
    o
  }
  type ObjectNodeT = com.fasterxml.jackson.databind.node.ObjectNode

  // ─────────────────────────── client ───────────────────────────

  private def grpcCall(host: String, port: Int, token: String, path: String,
                       request: Array[Byte]): Array[Byte] = {
    val ep = Http2.connect(host, port)
    try {
      ep.sendMessage(Seq(
        ":method" -> "POST", ":scheme" -> "http", ":path" -> path,
        ":authority" -> s"$host:$port",
        "content-type" -> "application/grpc", "te" -> "trailers",
        "authorization" -> s"Bearer $token"),
        OtlpGrpc.grpcFrame(request))
      val (_, headers, body, trailers) = ep.readMessage()
      val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
      if (status != "0")
        throw new IllegalStateException(s"bigquery_write_api: grpc-status " +
          s"$status ${(trailers ++ headers).toMap.getOrElse("grpc-message", "")}")
      OtlpGrpc.parseGrpcFrame(body)
    } finally ep.close()
  }

  private val Svc = "/google.cloud.bigquery.storage.v1.BigQueryWrite"

  def createPendingStream(host: String, port: Int, token: String,
                          parent: String): String = {
    val req = msg { b =>
      strField(b, 1, parent)
      lenField(b, 2, msg(intField(_, 2, 1L))) // WriteStream{type: PENDING}
    }
    val resp = new Reader(grpcCall(host, port, token,
      s"$Svc/CreateWriteStream", req))
    var name = ""
    while (resp.hasNext) resp.readTag() match {
      case (1, 2) => name = new String(resp.readBytes(), UTF_8)
      case (_, w) => resp.skip(w)
    }
    name
  }

  /** One AppendRows call; returns the acknowledged offset. */
  def appendRows(host: String, port: Int, token: String,
                 writeStream: String, offset: Long,
                 descriptor: Array[Byte],
                 rows: Seq[Array[Byte]]): Long = {
    val req = msg { b =>
      strField(b, 1, writeStream)
      if (offset >= 0) lenField(b, 2, msg(intField(_, 1, offset)))
      lenField(b, 4, msg { pd =>
        lenField(pd, 1, msg(lenField(_, 1, descriptor))) // writer_schema
        lenField(pd, 2, msg { rb =>
          rows.foreach(lenField(rb, 1, _)) // serialized_rows
        })
      })
    }
    val resp = new Reader(grpcCall(host, port, token, s"$Svc/AppendRows", req))
    var acked = -1L
    while (resp.hasNext) resp.readTag() match {
      case (1, 2) => // append_result{offset{value}}
        val ar = new Reader(resp.readBytes())
        while (ar.hasNext) ar.readTag() match {
          case (1, 2) =>
            val or = new Reader(ar.readBytes())
            while (or.hasNext) or.readTag() match {
              case (1, 0) => acked = or.readVarint()
              case (_, w) => or.skip(w)
            }
          case (_, w) => ar.skip(w)
        }
      case (_, w) => resp.skip(w)
    }
    acked
  }

  def finalizeStream(host: String, port: Int, token: String,
                     name: String): Long = {
    val resp = new Reader(grpcCall(host, port, token,
      s"$Svc/FinalizeWriteStream", msg(strField(_, 1, name))))
    var rows = 0L
    while (resp.hasNext) resp.readTag() match {
      case (1, 0) => rows = resp.readVarint()
      case (_, w) => resp.skip(w)
    }
    rows
  }

  def batchCommit(host: String, port: Int, token: String, parent: String,
                  streams: Seq[String]): Unit = {
    val req = msg { b =>
      strField(b, 1, parent)
      streams.foreach(strField(b, 2, _))
    }
    grpcCall(host, port, token, s"$Svc/BatchCommitWriteStreams", req)
    ()
  }

  /** Write JSON rows. `mode` ∈ default_stream / pending_stream. */
  def write(df: DataFrame, host: String, port: Int, token: String,
            project: String, dataset: String, table: String,
            fields: Seq[Field], mode: String = "default_stream",
            batchSize: Int = 500, valueCol: Column = col("value")): Unit = {
    require(Set("default_stream", "pending_stream")(mode), s"mode $mode")
    val parent = s"projects/$project/datasets/$dataset/tables/$table"
    val (h, p, t, fs, md, bs) = (host, port, token, fields, mode, batchSize)
    df.select(valueCol.cast("string").as("v")).rdd.foreachPartition { it =>
      val m = new ObjectMapper()
      val desc = descriptorProto("GraftRow", fs)
      it.grouped(bs).foreach { rows =>
        val encoded = rows.map(r => encodeRow(m.readTree(r.getString(0)), fs))
        if (md == "default_stream")
          appendRows(h, p, t, s"$parent/streams/_default", -1L, desc, encoded)
        else {
          // fresh pending stream per batch: append at offset 0,
          // finalize, commit — exactly-once within the batch
          val stream = createPendingStream(h, p, t, parent)
          val acked = appendRows(h, p, t, stream, 0L, desc, encoded)
          require(acked == encoded.size - 1,
            s"pending append acked $acked of ${encoded.size}")
          val n = finalizeStream(h, p, t, stream)
          require(n == encoded.size, s"finalize counted $n")
          batchCommit(h, p, t, parent, Seq(stream))
        }
      }
      ()
    }
  }

  // ─────────────────────────── server ───────────────────────────

  /** Loopback BigQueryWrite: bearer-authed; `_default` appends land
    * immediately; pending streams buffer, refuse post-finalize
    * appends, and only surface rows after BatchCommitWriteStreams.
    */
  final class Server(token: String) {
    private val m = new ObjectMapper()
    /** parent → committed rows (decoded JSON). */
    val tables: mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]] =
      mutable.LinkedHashMap.empty
    private final case class Pending(parent: String,
      rows: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty,
      var finalized: Boolean = false)
    private val pending = mutable.LinkedHashMap.empty[String, Pending]
    private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

    def committed(parent: String): Seq[String] = synchronized {
      tables.getOrElse(parent, mutable.ArrayBuffer.empty).toSeq
    }
    def uncommittedStreams: Int = synchronized(pending.size)

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
              if (status == "0") OtlpGrpc.grpcFrame(payload) else Array.empty,
              Seq("grpc-status" -> status) ++
                (if (message.nonEmpty) Seq("grpc-message" -> message)
                 else Nil),
              stream = sid)
            ()
          }
          if (!h.get("authorization").contains(s"Bearer $token"))
            respond(Array.empty, "16", "unauthenticated")
          else {
            val req = OtlpGrpc.parseGrpcFrame(body)
            h.getOrElse(":path", "").stripPrefix(Svc + "/") match {
              case "CreateWriteStream" =>
                val r = new Reader(req)
                var parent = ""
                while (r.hasNext) r.readTag() match {
                  case (1, 2) => parent = new String(r.readBytes(), UTF_8)
                  case (_, w) => r.skip(w)
                }
                val name = s"$parent/streams/pending-${streamSeq.incrementAndGet()}"
                synchronized { pending(name) = Pending(parent) }
                respond(msg(strField(_, 1, name)), "0")
              case "AppendRows" =>
                handleAppend(req) match {
                  case Right(ackOffset) =>
                    respond(msg(b => lenField(b, 1,
                      msg(lenField(_, 1, msg(intField(_, 1, ackOffset)))))),
                      "0")
                  case Left(err) => respond(Array.empty, "9", err)
                }
              case "FinalizeWriteStream" =>
                val r = new Reader(req)
                var name = ""
                while (r.hasNext) r.readTag() match {
                  case (1, 2) => name = new String(r.readBytes(), UTF_8)
                  case (_, w) => r.skip(w)
                }
                synchronized(pending.get(name)) match {
                  case Some(ps) =>
                    ps.finalized = true
                    respond(msg(intField(_, 1, ps.rows.size.toLong)), "0")
                  case None => respond(Array.empty, "5", s"stream $name")
                }
              case "BatchCommitWriteStreams" =>
                val r = new Reader(req)
                var parent = ""
                val streams = mutable.Buffer[String]()
                while (r.hasNext) r.readTag() match {
                  case (1, 2) => parent = new String(r.readBytes(), UTF_8)
                  case (2, 2) => streams += new String(r.readBytes(), UTF_8)
                  case (_, w) => r.skip(w)
                }
                val bad = streams.filterNot(s =>
                  synchronized(pending.get(s)).exists(_.finalized))
                if (bad.nonEmpty)
                  respond(Array.empty, "9",
                    s"streams not finalized: ${bad.mkString(",")}")
                else {
                  synchronized {
                    streams.foreach { s =>
                      val ps = pending.remove(s).get
                      tables.getOrElseUpdate(ps.parent,
                        mutable.ArrayBuffer.empty) ++= ps.rows
                    }
                  }
                  respond(msg(_ => ()), "0")
                }
              case other => respond(Array.empty, "12", s"unknown $other")
            }
          }
        } catch {
          case _: java.io.EOFException => open = false
          case _: Exception => open = false
        }
      }
    })

    private def handleAppend(req: Array[Byte]): Either[String, Long] = {
      val r = new Reader(req)
      var stream = ""
      var offset = -1L
      var descriptor: Array[Byte] = null
      val rows = mutable.Buffer[Array[Byte]]()
      while (r.hasNext) r.readTag() match {
        case (1, 2) => stream = new String(r.readBytes(), UTF_8)
        case (2, 2) =>
          val or = new Reader(r.readBytes())
          while (or.hasNext) or.readTag() match {
            case (1, 0) => offset = or.readVarint()
            case (_, w) => or.skip(w)
          }
        case (4, 2) =>
          val pd = new Reader(r.readBytes())
          while (pd.hasNext) pd.readTag() match {
            case (1, 2) =>
              val ws = new Reader(pd.readBytes())
              while (ws.hasNext) ws.readTag() match {
                case (1, 2) => descriptor = ws.readBytes()
                case (_, w) => ws.skip(w)
              }
            case (2, 2) =>
              val rr = new Reader(pd.readBytes())
              while (rr.hasNext) rr.readTag() match {
                case (1, 2) => rows += rr.readBytes()
                case (_, w) => rr.skip(w)
              }
            case (_, w) => pd.skip(w)
          }
        case (_, w) => r.skip(w)
      }
      if (descriptor == null) return Left("missing writer_schema")
      val fields = parseDescriptor(descriptor)
      val decoded = rows.map(b => decodeRow(b, fields).toString)
      if (stream.endsWith("/_default")) {
        val parent = stream.stripSuffix("/streams/_default")
        synchronized {
          tables.getOrElseUpdate(parent, mutable.ArrayBuffer.empty) ++= decoded
        }
        Right(-1L)
      } else synchronized(pending.get(stream)) match {
        case Some(ps) =>
          if (ps.finalized) Left("stream already finalized")
          else if (offset >= 0 && offset != ps.rows.size)
            Left(s"offset $offset != ${ps.rows.size}")
          else {
            ps.rows ++= decoded
            Right(ps.rows.size - 1L)
          }
        case None => Left(s"unknown stream $stream")
      }
    }

    def port: Int = inner.port
    def stop(): Unit = inner.stop()
  }
}
