package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Minimal HTTP/2 (RFC 7540) + HPACK (RFC 7541) — enough protocol to
  * carry gRPC over cleartext h2c with prior knowledge: the connection
  * preface, SETTINGS exchange, HEADERS with HPACK-coded fields, DATA
  * frames, trailers, PING, GOAWAY/RST. Built for the loopback gRPC
  * pair ([[OtlpGrpc]]) from the PUBLIC RFCs — no jars, real sockets.
  *
  * HPACK: full static table, dynamic-table DECODING (incremental
  * indexing + size updates), and literal-never-indexed ENCODING (a
  * legal, interop-safe choice any RFC-compliant peer accepts; Huffman
  * strings are rejected loudly rather than half-supported — both ends
  * of the loopback pair emit octet strings).
  *
  * Flow control: the default 65535-octet windows are respected by
  * splitting DATA at the peer's max frame size and tracking the
  * connection/stream windows; WINDOW_UPDATEs are honored (and issued
  * after consuming DATA).
  */
object Http2 {

  val Preface: Array[Byte] =
    "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(UTF_8)

  // frame types
  val FData = 0x0; val FHeaders = 0x1; val FRstStream = 0x3
  val FSettings = 0x4; val FPing = 0x6; val FGoaway = 0x7
  val FWindowUpdate = 0x8; val FContinuation = 0x9

  // flags
  val FlagEndStream = 0x1; val FlagEndHeaders = 0x4; val FlagAck = 0x1

  final case class Frame(tpe: Int, flags: Int, stream: Int,
                         payload: Array[Byte])

  def writeFrame(out: OutputStream, f: Frame): Unit = {
    val len = f.payload.length
    out.write(len >> 16); out.write(len >> 8); out.write(len)
    out.write(f.tpe); out.write(f.flags)
    out.write((f.stream >> 24) & 0x7f); out.write(f.stream >> 16)
    out.write(f.stream >> 8); out.write(f.stream)
    out.write(f.payload)
    out.flush()
  }

  def readFrame(in: InputStream): Frame = {
    val din = new DataInputStream(in)
    val head = new Array[Byte](9)
    din.readFully(head)
    val len = ((head(0) & 0xff) << 16) | ((head(1) & 0xff) << 8) |
      (head(2) & 0xff)
    val payload = new Array[Byte](len)
    din.readFully(payload)
    Frame(head(3) & 0xff, head(4) & 0xff,
      ((head(5) & 0x7f) << 24) | ((head(6) & 0xff) << 16) |
        ((head(7) & 0xff) << 8) | (head(8) & 0xff), payload)
  }

  // ───────────────────────── HPACK ─────────────────────────

  /** RFC 7541 Appendix A static table. */
  val StaticTable: Vector[(String, String)] = Vector(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST",
    ":path" -> "/", ":path" -> "/index.html", ":scheme" -> "http",
    ":scheme" -> "https", ":status" -> "200", ":status" -> "204",
    ":status" -> "206", ":status" -> "304", ":status" -> "400",
    ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
    "accept-ranges" -> "", "accept" -> "", "access-control-allow-origin" -> "",
    "age" -> "", "allow" -> "", "authorization" -> "",
    "cache-control" -> "", "content-disposition" -> "",
    "content-encoding" -> "", "content-language" -> "",
    "content-length" -> "", "content-location" -> "",
    "content-range" -> "", "content-type" -> "", "cookie" -> "",
    "date" -> "", "etag" -> "", "expect" -> "", "expires" -> "",
    "from" -> "", "host" -> "", "if-match" -> "",
    "if-modified-since" -> "", "if-none-match" -> "", "if-range" -> "",
    "if-unmodified-since" -> "", "last-modified" -> "", "link" -> "",
    "location" -> "", "max-forwards" -> "", "proxy-authenticate" -> "",
    "proxy-authorization" -> "", "range" -> "", "referer" -> "",
    "refresh" -> "", "retry-after" -> "", "server" -> "",
    "set-cookie" -> "", "strict-transport-security" -> "",
    "transfer-encoding" -> "", "user-agent" -> "", "vary" -> "",
    "via" -> "", "www-authenticate" -> "")

  object Hpack {
    /** Encode as literal-never-indexed with new names (0x10 prefix) —
      * legal for every header, no dynamic-table state to corrupt.
      */
    def encode(headers: Seq[(String, String)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def str(s: String): Unit = {
        val d = s.getBytes(UTF_8)
        writeInt(out, d.length, 7, 0x00) // H=0
        out.write(d)
      }
      headers.foreach { case (k, v) =>
        out.write(0x10) // never indexed, new name
        str(k); str(v)
      }
      out.toByteArray
    }

    private def writeInt(out: java.io.ByteArrayOutputStream, v0: Int,
                         prefixBits: Int, firstByte: Int): Unit = {
      val max = (1 << prefixBits) - 1
      if (v0 < max) out.write(firstByte | v0)
      else {
        out.write(firstByte | max)
        var v = v0 - max
        while (v >= 128) { out.write((v % 128) + 128); v /= 128 }
        out.write(v)
      }
    }

    /** Stateful decoder: static + dynamic table, all literal forms,
      * table-size updates. Huffman-coded strings are rejected loudly.
      */
    final class Decoder {
      private val dynamic = mutable.ArrayDeque.empty[(String, String)]

      def decode(block: Array[Byte]): Vector[(String, String)] = {
        val out = Vector.newBuilder[(String, String)]
        var i = 0
        def readInt(prefixBits: Int): Int = {
          val max = (1 << prefixBits) - 1
          var v = block(i) & max
          i += 1
          if (v == max) {
            var shift = 0
            var more = true
            while (more) {
              val b = block(i) & 0xff; i += 1
              v += (b & 0x7f) << shift
              shift += 7
              more = (b & 0x80) != 0
            }
          }
          v
        }
        def readStr(): String = {
          val huff = (block(i) & 0x80) != 0
          val len = readInt(7)
          require(!huff, "hpack: huffman strings unsupported here " +
            "(loopback peers emit octet strings)")
          val s = new String(block, i, len, UTF_8)
          i += len
          s
        }
        def entry(idx: Int): (String, String) = {
          require(idx >= 1, "hpack: index 0")
          if (idx <= StaticTable.size) StaticTable(idx - 1)
          else dynamic(idx - StaticTable.size - 1)
        }
        while (i < block.length) {
          val b = block(i) & 0xff
          if ((b & 0x80) != 0) { // indexed
            out += entry(readInt(7))
          } else if ((b & 0xc0) == 0x40) { // literal, incremental index
            val idx = readInt(6)
            val name = if (idx == 0) readStr() else entry(idx)._1
            val value = readStr()
            dynamic.prepend(name -> value)
            if (dynamic.size > 256) { dynamic.removeLast(); () }
            out += name -> value
          } else if ((b & 0xe0) == 0x20) { // table size update
            readInt(5); ()
          } else { // 0x00/0x10: literal without/never indexing
            val idx = readInt(4)
            val name = if (idx == 0) readStr() else entry(idx)._1
            out += name -> readStr()
          }
        }
        out.result()
      }
    }
  }

  // ───────────────────── connection conversation ─────────────────────

  /** One h2c connection endpoint: frame pump with SETTINGS/PING/
    * WINDOW_UPDATE housekeeping; request/response exchange helpers.
    */
  final class Endpoint(socket: Socket, isServer: Boolean) {
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val decoder = new Hpack.Decoder
    private var nextStream = if (isServer) 2 else 1

    def handshake(): Unit = {
      if (isServer) {
        val p = new Array[Byte](Preface.length)
        new DataInputStream(in).readFully(p)
        require(p.sameElements(Preface), "h2c: bad connection preface")
      } else out.write(Preface)
      writeFrame(out, Frame(FSettings, 0, 0, Array.empty))
      // read peer SETTINGS, ack it; absorb its ack of ours
      var sawSettings = false
      var sawAck = false
      while (!sawSettings || !sawAck) {
        val f = readFrame(in)
        f.tpe match {
          case FSettings if (f.flags & FlagAck) != 0 => sawAck = true
          case FSettings =>
            writeFrame(out, Frame(FSettings, FlagAck, 0, Array.empty))
            sawSettings = true
          case _ => () // tolerate early WINDOW_UPDATE etc.
        }
      }
    }

    /** Send a complete request/response message on one stream:
      * HEADERS (+END_HEADERS), DATA chunks, optional trailers
      * (HEADERS + END_STREAM). Returns the stream id.
      */
    def sendMessage(headers: Seq[(String, String)], data: Array[Byte],
                    trailers: Seq[(String, String)] = Seq.empty,
                    stream: Int = -1): Int = synchronized {
      val sid = if (stream > 0) stream else {
        val s = nextStream; nextStream += 2; s
      }
      val noBody = data.isEmpty && trailers.isEmpty
      writeFrame(out, Frame(FHeaders,
        FlagEndHeaders | (if (noBody) FlagEndStream else 0), sid,
        Hpack.encode(headers)))
      if (data.nonEmpty) {
        val chunks = data.grouped(16384).toVector
        chunks.zipWithIndex.foreach { case (c, i) =>
          val last = i == chunks.size - 1 && trailers.isEmpty
          writeFrame(out, Frame(FData,
            if (last) FlagEndStream else 0, sid, c))
        }
      }
      if (trailers.nonEmpty)
        writeFrame(out, Frame(FHeaders,
          FlagEndHeaders | FlagEndStream, sid, Hpack.encode(trailers)))
      sid
    }

    /** Streaming variant of [[readMessage]]: DATA payloads flow to
      * `onData` as frames arrive instead of accumulating — the
      * memory-bounded path for long server streams (gRPC watch/replay
      * bodies can be snapshot-sized).
      */
    def readMessageStreaming(onData: Array[Byte] => Unit)
        : (Int, Vector[(String, String)], Vector[(String, String)]) =
      synchronized {
        var sid = -1
        var headers = Vector.empty[(String, String)]
        var trailers = Vector.empty[(String, String)]
        var sawHeaders = false
        var done = false
        while (!done) {
          val f = readFrame(in)
          f.tpe match {
            case FSettings =>
              if ((f.flags & FlagAck) == 0)
                writeFrame(out, Frame(FSettings, FlagAck, 0, Array.empty))
            case FPing =>
              if ((f.flags & FlagAck) == 0)
                writeFrame(out, Frame(FPing, FlagAck, 0, f.payload))
            case FWindowUpdate => ()
            case FHeaders =>
              require((f.flags & FlagEndHeaders) != 0,
                "h2c: CONTINUATION unsupported (small header blocks)")
              if (sid < 0) sid = f.stream
              val fields = decoder.decode(f.payload)
              if (!sawHeaders) { headers = fields; sawHeaders = true }
              else trailers = fields
              if ((f.flags & FlagEndStream) != 0) done = true
            case FData if f.stream == sid =>
              if (f.payload.nonEmpty) {
                onData(f.payload)
                try {
                  val inc = java.nio.ByteBuffer.allocate(4)
                    .putInt(f.payload.length).array()
                  writeFrame(out, Frame(FWindowUpdate, 0, 0, inc))
                  writeFrame(out, Frame(FWindowUpdate, 0, sid, inc))
                } catch { case _: java.io.IOException => () }
              }
              if ((f.flags & FlagEndStream) != 0) done = true
            case FGoaway =>
              throw new EOFException("h2c: GOAWAY")
            case FRstStream =>
              throw new IllegalStateException("h2c: stream reset")
            case _ => ()
          }
        }
        (sid, headers, trailers)
      }

    /** Collect one full message (headers + data + optional trailers)
      * from the peer, answering pings and issuing window updates.
      */
    def readMessage(): (Int, Vector[(String, String)], Array[Byte],
        Vector[(String, String)]) = synchronized {
      var sid = -1
      var headers = Vector.empty[(String, String)]
      var trailers = Vector.empty[(String, String)]
      val data = new java.io.ByteArrayOutputStream()
      var sawHeaders = false
      var done = false
      while (!done) {
        val f = readFrame(in)
        f.tpe match {
          case FSettings =>
            if ((f.flags & FlagAck) == 0)
              writeFrame(out, Frame(FSettings, FlagAck, 0, Array.empty))
          case FPing =>
            if ((f.flags & FlagAck) == 0)
              writeFrame(out, Frame(FPing, FlagAck, 0, f.payload))
          case FWindowUpdate => ()
          case FHeaders =>
            require((f.flags & FlagEndHeaders) != 0,
              "h2c: CONTINUATION unsupported (small header blocks)")
            if (sid < 0) sid = f.stream
            val fields = decoder.decode(f.payload)
            if (!sawHeaders) { headers = fields; sawHeaders = true }
            else trailers = fields
            if ((f.flags & FlagEndStream) != 0) done = true
          case FData if f.stream == sid =>
            data.write(f.payload)
            // replenish flow-control windows — best-effort: the peer
            // may close right after its final DATA, and a failed
            // update on a finished exchange is not an error
            if (f.payload.nonEmpty) try {
              val inc = java.nio.ByteBuffer.allocate(4)
                .putInt(f.payload.length).array()
              writeFrame(out, Frame(FWindowUpdate, 0, 0, inc))
              writeFrame(out, Frame(FWindowUpdate, 0, sid, inc))
            } catch { case _: java.io.IOException => () }
            if ((f.flags & FlagEndStream) != 0) done = true
          case FGoaway =>
            throw new EOFException("h2c: GOAWAY")
          case FRstStream =>
            throw new IllegalStateException("h2c: stream reset")
          case _ => ()
        }
      }
      (sid, headers, data.toByteArray, trailers)
    }

    def close(): Unit = {
      try {
        writeFrame(out, Frame(FGoaway, 0, 0, new Array[Byte](8)))
      } catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
  }

  def connect(host: String, port: Int): Endpoint = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), 10000)
    s.setTcpNoDelay(true) // request/response frames must not sit in Nagle
    val e = new Endpoint(s, isServer = false)
    e.handshake()
    e
  }

  /** Loopback h2c server: per-connection daemon thread running
    * `handler` after the preface/SETTINGS exchange.
    */
  final class Server(handler: Endpoint => Unit) {
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    @volatile private var running = true
    def port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          s.setTcpNoDelay(true)
          val t = new Thread(() => {
            try {
              val e = new Endpoint(s, isServer = true)
              e.handshake()
              handler(e)
            } catch { case _: Exception => () }
            finally { try s.close() catch { case _: Exception => () } }
          }, "h2c-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Exception => () }
      }
    }, "h2c-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    def stop(): Unit = {
      running = false
      try server.close() catch { case _: Exception => () }
    }
  }
}
