package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Bolt protocol stack for the `cypher` output
  * (internal/impl/cypher/output.go:89 — "writes a batch of messages to
  * any graph database that supports the Neo4j or Bolt protocols";
  * contract only, no code ported: the reference wraps the official
  * neo4j driver, this implements the PUBLIC Bolt 4.4 wire protocol —
  * PackStream v2 serialization, chunked message framing, the
  * 0x6060B017 handshake, and the HELLO/RUN/PULL/RECORD/SUCCESS/
  * FAILURE message vocabulary).
  *
  * [[PackStream]]: the complete scalar/collection surface — nulls,
  * booleans, the five integer encodings (tiny/8/16/32/64), float64,
  * the four string/list/map width classes, structs.
  *
  * [[Bolt.Conn]]: chunk framing (2-byte big-endian sizes, 0x0000
  * terminator; large messages split across chunks), version
  * negotiation, auth, autocommit RUN+PULL.
  *
  * [[Bolt.Server]]: a loopback Bolt server over a REAL TCP socket
  * executing a cypher subset (CREATE with parameter props, MATCH by
  * label + equality predicates, RETURN property projections with
  * ORDER BY/LIMIT) against an in-memory node store — enough to drive
  * the output's full wire path and read results back for the oracle.
  */
object PackStream {

  // ---- encode ----

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(new DataOutputStream(out), v)
    out.toByteArray
  }

  def write(o: DataOutputStream, v: Any): Unit = v match {
    case null => o.writeByte(0xC0)
    case b: Boolean => o.writeByte(if (b) 0xC3 else 0xC2)
    case d: Double => o.writeByte(0xC1); o.writeDouble(d)
    case f: Float => o.writeByte(0xC1); o.writeDouble(f.toDouble)
    case i: Int => write(o, i.toLong)
    case l: Long =>
      if (l >= -16 && l <= 127) o.writeByte(l.toInt & 0xFF)
      else if (l >= Byte.MinValue && l <= Byte.MaxValue) {
        o.writeByte(0xC8); o.writeByte(l.toInt)
      } else if (l >= Short.MinValue && l <= Short.MaxValue) {
        o.writeByte(0xC9); o.writeShort(l.toInt)
      } else if (l >= Int.MinValue && l <= Int.MaxValue) {
        o.writeByte(0xCA); o.writeInt(l.toInt)
      } else { o.writeByte(0xCB); o.writeLong(l) }
    case s: String =>
      val b = s.getBytes(UTF_8)
      if (b.length <= 15) o.writeByte(0x80 | b.length)
      else if (b.length <= 255) { o.writeByte(0xD0); o.writeByte(b.length) }
      else if (b.length <= 65535) { o.writeByte(0xD1); o.writeShort(b.length) }
      else { o.writeByte(0xD2); o.writeInt(b.length) }
      o.write(b)
    case xs: Seq[_] =>
      if (xs.length <= 15) o.writeByte(0x90 | xs.length)
      else if (xs.length <= 255) { o.writeByte(0xD4); o.writeByte(xs.length) }
      else if (xs.length <= 65535) { o.writeByte(0xD5); o.writeShort(xs.length) }
      else { o.writeByte(0xD6); o.writeInt(xs.length) }
      xs.foreach(write(o, _))
    case m: Map[_, _] =>
      if (m.size <= 15) o.writeByte(0xA0 | m.size)
      else if (m.size <= 255) { o.writeByte(0xD8); o.writeByte(m.size) }
      else if (m.size <= 65535) { o.writeByte(0xD9); o.writeShort(m.size) }
      else { o.writeByte(0xDA); o.writeInt(m.size) }
      m.foreach { case (k, mv) => write(o, String.valueOf(k)); write(o, mv) }
    case Struct(tag, fields) =>
      require(fields.size <= 15, "packstream: struct too wide")
      o.writeByte(0xB0 | fields.size)
      o.writeByte(tag)
      fields.foreach(write(o, _))
    case other => throw new IllegalArgumentException(
      s"packstream: unsupported ${other.getClass}")
  }

  final case class Struct(tag: Int, fields: Seq[Any])

  // ---- decode ----

  final class Reader(buf: Array[Byte], var pos: Int = 0) {
    private def u8(): Int = { val b = buf(pos) & 0xFF; pos += 1; b }
    private def i8(): Int = { val b = buf(pos).toInt; pos += 1; b }
    private def i16(): Int = {
      val v = ((buf(pos) & 0xFF) << 8) | (buf(pos + 1) & 0xFF)
      pos += 2; v.toShort.toInt
    }
    private def u16(): Int = {
      val v = ((buf(pos) & 0xFF) << 8) | (buf(pos + 1) & 0xFF); pos += 2; v
    }
    private def i32(): Int = {
      var v = 0
      (0 until 4).foreach(i => v = (v << 8) | (buf(pos + i) & 0xFF))
      pos += 4; v
    }
    private def i64(): Long = {
      var v = 0L
      (0 until 8).foreach(i => v = (v << 8) | (buf(pos + i) & 0xFF))
      pos += 8; v
    }
    private def str(n: Int): String = {
      val s = new String(buf, pos, n, UTF_8); pos += n; s
    }

    def read(): Any = {
      val marker = u8()
      if (marker <= 0x7F) marker.toLong // tiny positive int
      else if (marker >= 0xF0) (marker - 0x100).toLong // tiny negative
      else if ((marker & 0xF0) == 0x80) str(marker & 0x0F)
      else if ((marker & 0xF0) == 0x90) readList(marker & 0x0F)
      else if ((marker & 0xF0) == 0xA0) readMap(marker & 0x0F)
      else if ((marker & 0xF0) == 0xB0) {
        val size = marker & 0x0F
        val tag = u8()
        Struct(tag, (0 until size).map(_ => read()))
      } else marker match {
        case 0xC0 => null
        case 0xC1 => java.lang.Double.longBitsToDouble(i64())
        case 0xC2 => false
        case 0xC3 => true
        case 0xC8 => i8().toLong
        case 0xC9 => i16().toLong
        case 0xCA => i32().toLong
        case 0xCB => i64()
        case 0xD0 => str(u8())
        case 0xD1 => str(u16())
        case 0xD2 => str(i32())
        case 0xD4 => readList(u8())
        case 0xD5 => readList(u16())
        case 0xD6 => readList(i32())
        case 0xD8 => readMap(u8())
        case 0xD9 => readMap(u16())
        case 0xDA => readMap(i32())
        case other => throw new IllegalArgumentException(
          f"packstream: unknown marker 0x$other%02x")
      }
    }

    private def readList(n: Int): Seq[Any] = (0 until n).map(_ => read())
    private def readMap(n: Int): Map[String, Any] =
      (0 until n).map { _ =>
        val k = read().asInstanceOf[String]
        k -> read()
      }.toMap
  }

  def decode(buf: Array[Byte]): Any = new Reader(buf).read()
}

object Bolt {

  val Magic: Array[Byte] =
    Array(0x60, 0x60, 0xB0, 0x17).map(_.toByte)

  // message tags (Bolt 4.4)
  val MsgHello = 0x01
  val MsgGoodbye = 0x02
  val MsgReset = 0x0F
  val MsgRun = 0x10
  val MsgDiscard = 0x2F
  val MsgPull = 0x3F
  val MsgRecord = 0x71
  val MsgSuccess = 0x70
  val MsgIgnored = 0x7E
  val MsgFailure = 0x7F

  class BoltError(val code: String, msg: String)
      extends RuntimeException(s"$code: $msg")

  // ---- chunked framing over a socket ----

  final class Conn(socket: java.net.Socket) extends AutoCloseable {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))

    /** Client side: magic + four proposals, server picks. */
    def handshake(): Int = {
      out.write(Magic)
      Seq(0x0404, 0x0403, 0x0400, 0x0300).foreach(out.writeInt)
      out.flush()
      val chosen = in.readInt()
      require(chosen != 0, "bolt: no common protocol version")
      chosen
    }

    def sendMessage(tag: Int, fields: Seq[Any]): Unit = {
      val body = PackStream.encode(PackStream.Struct(tag, fields))
      var off = 0
      while (off < body.length) {
        val n = math.min(0xFFFF, body.length - off)
        out.writeShort(n)
        out.write(body, off, n)
        off += n
      }
      out.writeShort(0) // message boundary
      out.flush()
    }

    def readMessage(): PackStream.Struct = {
      val buf = new ByteArrayOutputStream()
      var size = in.readUnsignedShort()
      while (size != 0) {
        val chunk = new Array[Byte](size)
        in.readFully(chunk)
        buf.write(chunk)
        size = in.readUnsignedShort()
      }
      PackStream.decode(buf.toByteArray).asInstanceOf[PackStream.Struct]
    }

    def hello(principal: String, credentials: String): Unit = {
      sendMessage(MsgHello, Seq(Map(
        "user_agent" -> "graft/1.0",
        "scheme" -> "basic",
        "principal" -> principal,
        "credentials" -> credentials)))
      expectSuccess()
    }

    /** Autocommit query: RUN + PULL{-1}; returns (columns, rows). */
    def run(query: String, params: Map[String, Any],
            db: String = ""): (Seq[String], Seq[Seq[Any]]) = {
      val extra: Map[String, Any] =
        if (db.isEmpty) Map.empty else Map("db" -> db)
      sendMessage(MsgRun, Seq(query, params, extra))
      val runOk = expectSuccess()
      val cols = runOk.get("fields") match {
        case Some(xs: Seq[_]) => xs.map(String.valueOf(_))
        case _ => Nil
      }
      sendMessage(MsgPull, Seq(Map("n" -> -1L)))
      val rows = Seq.newBuilder[Seq[Any]]
      var done = false
      while (!done) {
        val msg = readMessage()
        msg.tag match {
          case MsgRecord =>
            rows += msg.fields.head.asInstanceOf[Seq[Any]]
          case MsgSuccess => done = true
          case MsgFailure =>
            val m = msg.fields.head.asInstanceOf[Map[String, Any]]
            throw new BoltError(String.valueOf(m.getOrElse("code", "?")),
              String.valueOf(m.getOrElse("message", "")))
          case other => throw new IllegalStateException(
            f"bolt: unexpected message 0x$other%02x during PULL")
        }
      }
      (cols, rows.result())
    }

    def reset(): Unit = { sendMessage(MsgReset, Seq.empty); expectSuccess() }

    private def expectSuccess(): Map[String, Any] = {
      val msg = readMessage()
      msg.tag match {
        case MsgSuccess =>
          msg.fields.headOption.map(_.asInstanceOf[Map[String, Any]])
            .getOrElse(Map.empty)
        case MsgFailure =>
          val m = msg.fields.head.asInstanceOf[Map[String, Any]]
          throw new BoltError(String.valueOf(m.getOrElse("code", "?")),
            String.valueOf(m.getOrElse("message", "")))
        case other => throw new IllegalStateException(
          f"bolt: unexpected message 0x$other%02x")
      }
    }

    override def close(): Unit = {
      try sendMessage(MsgGoodbye, Seq.empty)
      catch { case _: Exception => () }
      socket.close()
    }
  }

  def connect(host: String, port: Int, user: String,
              password: String): Conn = {
    val c = new Conn(new java.net.Socket(host, port))
    c.handshake()
    c.hello(user, password)
    c
  }

  // ---- loopback server: Bolt wire + cypher subset ----

  /** In-memory node store: (labels, properties) rows. */
  final class Graph {
    val nodes: mutable.ArrayBuffer[(Set[String], Map[String, Any])] =
      mutable.ArrayBuffer.empty
  }

  /** Executes the cypher subset the output's corpus needs:
    * `CREATE (n:Label {k: $p, …})`, `MATCH (n:Label) [WHERE n.k = $p
    * [AND …]] RETURN n.a[, n.b…] [ORDER BY n.k [DESC]] [LIMIT n]`.
    */
  final class Server(user: String = "neo4j", password: String = "pass") {
    val graph = new Graph
    @volatile private var server: java.net.ServerSocket = _
    @volatile var negotiated: Int = 0

    def start(): Int = {
      server = new java.net.ServerSocket(0, 16,
        java.net.InetAddress.getByName("127.0.0.1"))
      val t = new Thread(() => {
        try {
          while (!server.isClosed) {
            val sock = server.accept()
            val h = new Thread(() => serve(sock))
            h.setDaemon(true)
            h.start()
          }
        } catch { case _: Exception => () }
      })
      t.setDaemon(true)
      t.start()
      server.getLocalPort
    }

    def stop(): Unit = if (server != null) server.close()

    private def serve(sock: java.net.Socket): Unit = {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      try {
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(java.util.Arrays.equals(magic, Magic), "bad bolt magic")
        val proposals = (0 until 4).map(_ => in.readInt())
        val chosen = proposals.find(p => (p & 0xFF00) == 0x0400)
          .orElse(proposals.find(_ != 0)).getOrElse(0)
        negotiated = chosen
        out.writeInt(chosen)
        out.flush()
        var authed = false
        var done = false
        while (!done) {
          val msg = readMsg(in)
          msg.tag match {
            case MsgHello =>
              val m = msg.fields.head.asInstanceOf[Map[String, Any]]
              if (m.get("principal").contains(user) &&
                  m.get("credentials").contains(password)) {
                authed = true
                send(out, MsgSuccess, Seq(Map(
                  "server" -> "graft-bolt/4.4",
                  "connection_id" -> "bolt-1")))
              } else {
                send(out, MsgFailure, Seq(Map(
                  "code" -> "Neo.ClientError.Security.Unauthorized",
                  "message" -> "authentication failure")))
              }
            case MsgGoodbye => done = true
            case MsgReset => send(out, MsgSuccess, Seq(Map.empty[String, Any]))
            case MsgRun if !authed =>
              send(out, MsgFailure, Seq(Map(
                "code" -> "Neo.ClientError.Security.Unauthorized",
                "message" -> "not authenticated")))
            case MsgRun =>
              val query = msg.fields.head.asInstanceOf[String]
              val params = msg.fields(1).asInstanceOf[Map[String, Any]]
              try {
                val (cols, rows) = Cypher.execute(graph, query, params)
                send(out, MsgSuccess, Seq(Map("fields" -> cols.toSeq)))
                // await PULL
                val pull = readMsg(in)
                require(pull.tag == MsgPull || pull.tag == MsgDiscard,
                  "expected PULL/DISCARD after RUN")
                if (pull.tag == MsgPull)
                  rows.foreach(r => send(out, MsgRecord, Seq(r)))
                send(out, MsgSuccess, Seq(Map[String, Any]("t_last" -> 0L)))
              } catch {
                case e: Exception =>
                  send(out, MsgFailure, Seq(Map(
                    "code" -> "Neo.ClientError.Statement.SyntaxError",
                    "message" -> String.valueOf(e.getMessage))))
              }
            case other =>
              send(out, MsgFailure, Seq(Map(
                "code" -> "Neo.ClientError.Request.Invalid",
                "message" -> f"unexpected tag 0x$other%02x")))
          }
        }
      } catch { case _: Exception => () }
      finally sock.close()
    }

    private def readMsg(in: java.io.DataInputStream): PackStream.Struct = {
      val buf = new ByteArrayOutputStream()
      var size = in.readUnsignedShort()
      while (size != 0) {
        val chunk = new Array[Byte](size)
        in.readFully(chunk)
        buf.write(chunk)
        size = in.readUnsignedShort()
      }
      PackStream.decode(buf.toByteArray).asInstanceOf[PackStream.Struct]
    }

    private def send(out: java.io.DataOutputStream, tag: Int,
                     fields: Seq[Any]): Unit = {
      val body = PackStream.encode(PackStream.Struct(tag, fields))
      var off = 0
      while (off < body.length) {
        val n = math.min(0xFFFF, body.length - off)
        out.writeShort(n); out.write(body, off, n); off += n
      }
      out.writeShort(0)
      out.flush()
    }
  }

  /** The server-side cypher subset interpreter. */
  object Cypher {
    private val CreateRe =
      """(?is)\s*CREATE\s*\(\s*\w+\s*:\s*(\w+)\s*\{(.*)\}\s*\)\s*""".r
    private val MatchRe =
      """(?is)\s*MATCH\s*\(\s*(\w+)\s*:\s*(\w+)\s*\)\s*(?:WHERE\s+(.*?))?\s*RETURN\s+(.*?)\s*(?:ORDER\s+BY\s+(\S+(?:\s+DESC)?))?\s*(?:LIMIT\s+(\d+))?\s*""".r

    def execute(g: Graph, query: String,
                params: Map[String, Any]): (Seq[String], Seq[Seq[Any]]) =
      query match {
        case CreateRe(label, propsSrc) =>
          val props = propsSrc.split(",").filter(_.trim.nonEmpty).map { kv =>
            val Array(k, v) = kv.split(":", 2).map(_.trim)
            k -> resolveValue(v, params)
          }.toMap
          g.synchronized { g.nodes += ((Set(label), props)) }
          (Nil, Nil)
        case MatchRe(alias, label, whereSrc, returnSrc, orderSrc, limitSrc) =>
          val preds = Option(whereSrc).map(_.split("(?i)\\s+AND\\s+").toSeq
            .map { p =>
              val Array(l, r) = p.split("=", 2).map(_.trim)
              (stripAlias(l, alias), resolveValue(r, params))
            }).getOrElse(Nil)
          // field names surface EXACTLY as written (neo4j keeps the
          // alias-qualified text); property lookup uses the bare name
          val projections = returnSrc.split(",").map(_.trim).toSeq
          var rows = g.synchronized {
            g.nodes.toSeq.filter { case (labels, props) =>
              labels.contains(label) && preds.forall { case (k, v) =>
                props.get(k).exists(equalish(_, v))
              }
            }
          }
          Option(orderSrc).foreach { o =>
            val desc = o.toUpperCase.endsWith("DESC")
            val key = stripAlias(o.split("\\s+").head, alias)
            rows = rows.sortWith { (a, b) =>
              val cmp = compare(a._2.get(key), b._2.get(key))
              if (desc) cmp > 0 else cmp < 0
            }
          }
          Option(limitSrc).foreach(l => rows = rows.take(l.toInt))
          (projections,
            rows.map(n => projections.map(p =>
              n._2.getOrElse(stripAlias(p, alias), null))))
        case other =>
          throw new IllegalArgumentException(
            s"cypher subset: unsupported query: ${other.take(80)}")
      }

    private def stripAlias(expr: String, alias: String): String =
      expr.stripPrefix(alias + ".").trim

    private def resolveValue(src: String, params: Map[String, Any]): Any =
      if (src.startsWith("$"))
        params.getOrElse(src.drop(1),
          throw new IllegalArgumentException(s"missing parameter $src"))
      else if (src.startsWith("'") || src.startsWith("\""))
        src.substring(1, src.length - 1)
      else if (src.equalsIgnoreCase("true")) true
      else if (src.equalsIgnoreCase("false")) false
      else if (src.contains('.')) src.toDouble
      else src.toLong

    private def equalish(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Double) => x.toDouble == y
      case (x: Double, y: Long) => x == y.toDouble
      case _ => a == b
    }

    private def compare(a: Option[Any], b: Option[Any]): Int = (a, b) match {
      case (Some(x: Long), Some(y: Long)) => java.lang.Long.compare(x, y)
      case (Some(x: Double), Some(y: Double)) =>
        java.lang.Double.compare(x, y)
      case (Some(x: Long), Some(y: Double)) =>
        java.lang.Double.compare(x.toDouble, y)
      case (Some(x: Double), Some(y: Long)) =>
        java.lang.Double.compare(x, y.toDouble)
      case (Some(x: String), Some(y: String)) => x.compareTo(y)
      case (Some(_), None) => 1
      case (None, Some(_)) => -1
      case _ => 0
    }
  }
}
