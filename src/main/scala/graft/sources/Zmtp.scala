package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `zmq4` input/output (internal/impl/zeromq — contract only, no code
  * ported: the reference binds libzmq; this implements ZMTP 3.0, the
  * PUBLIC ZeroMQ transport protocol, directly over TCP):
  *
  *   - the 64-byte greeting (0xFF…0x7F signature, version 3.0, the
  *     NULL security mechanism padded to 20 bytes, as-server flag);
  *   - frames: flags byte (MORE / LONG / COMMAND bits) + 1-or-8-byte
  *     big-endian length + body; commands (`READY` with the
  *     `Socket-Type` metadata property) vs messages (multipart via
  *     MORE);
  *   - socket-pair validation per the spec's compatibility matrix
  *     (PUSH↔PULL, PUB↔SUB);
  *   - SUB subscriptions as `\x01topic` messages (ZMTP 3.0 form);
  *     PUB fans out only to matching prefix subscriptions and drops
  *     messages with no subscriber (PUB semantics, not a queue).
  *
  * The reference's config surface maps 1:1: `urls`, `bind`,
  * `socket_type` (PULL/SUB in, PUSH/PUB out), `sub_filters`.
  */
object Zmtp {

  val FlagMore = 0x01
  val FlagLong = 0x02
  val FlagCommand = 0x04

  final class Conn(socket: java.net.Socket, socketType: String,
                   asServer: Boolean) {
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))

    /** Greeting + NULL handshake + READY exchange; returns the peer's
      * declared socket type.
      */
    def handshake(): String = {
      val greeting = new Array[Byte](64)
      greeting(0) = 0xFF.toByte
      greeting(9) = 0x7F.toByte
      greeting(10) = 3 // major
      greeting(11) = 0 // minor
      val mech = "NULL".getBytes(UTF_8)
      System.arraycopy(mech, 0, greeting, 12, mech.length)
      greeting(32) = if (asServer) 1 else 0
      out.write(greeting); out.flush()
      val peer = new Array[Byte](64)
      in.readFully(peer)
      require((peer(0) & 0xFF) == 0xFF && (peer(9) & 0xFF) == 0x7F,
        "zmtp: bad greeting signature")
      require(peer(10) == 3, s"zmtp: unsupported version ${peer(10)}")
      val peerMech = new String(peer, 12, 20, UTF_8).takeWhile(_ != 0)
      require(peerMech == "NULL", s"zmtp: unsupported mechanism $peerMech")
      // READY with Socket-Type metadata
      sendCommand("READY", metadata("Socket-Type" -> socketType))
      val (name, body) = receiveCommand()
      require(name == "READY", s"zmtp: expected READY, got $name")
      parseMetadata(body).getOrElse("Socket-Type", "")
    }

    private def metadata(props: (String, String)*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      props.foreach { case (k, v) =>
        o.write(k.length)
        o.write(k.getBytes(UTF_8))
        val vb = v.getBytes(UTF_8)
        o.write((vb.length >> 24) & 0xFF); o.write((vb.length >> 16) & 0xFF)
        o.write((vb.length >> 8) & 0xFF); o.write(vb.length & 0xFF)
        o.write(vb)
      }
      o.toByteArray
    }

    private def parseMetadata(b: Array[Byte]): Map[String, String] = {
      val out = Map.newBuilder[String, String]
      var i = 0
      while (i < b.length) {
        val nameLen = b(i) & 0xFF; i += 1
        val name = new String(b, i, nameLen, UTF_8); i += nameLen
        val vLen = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
          ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        i += 4
        out += name -> new String(b, i, vLen, UTF_8)
        i += vLen
      }
      out.result()
    }

    def sendCommand(name: String, body: Array[Byte]): Unit = {
      val nameB = name.getBytes(UTF_8)
      val full = Array(nameB.length.toByte) ++ nameB ++ body
      writeFrame(FlagCommand, full)
    }

    def receiveCommand(): (String, Array[Byte]) = {
      val (flags, body) = readFrame()
      require((flags & FlagCommand) != 0, "zmtp: expected a command frame")
      val nameLen = body(0) & 0xFF
      (new String(body, 1, nameLen, UTF_8), body.drop(1 + nameLen))
    }

    /** One message, multipart via MORE. */
    def sendMessage(parts: Seq[Array[Byte]]): Unit = {
      parts.zipWithIndex.foreach { case (p, i) =>
        writeFrame(if (i < parts.size - 1) FlagMore else 0, p)
      }
      out.flush()
    }

    /** Next full (possibly multipart) MESSAGE, skipping commands;
      * null on EOF.
      */
    def receiveMessage(): Seq[Array[Byte]] = {
      val parts = mutable.ArrayBuffer.empty[Array[Byte]]
      var done = false
      while (!done) {
        val (flags, body) =
          try readFrame()
          catch { case _: java.io.EOFException => return null }
        if ((flags & FlagCommand) != 0) () // PING etc. — skip
        else {
          parts += body
          if ((flags & FlagMore) == 0) done = true
        }
      }
      parts.toSeq
    }

    private def writeFrame(flags: Int, body: Array[Byte]): Unit = {
      if (body.length > 255) {
        out.writeByte(flags | FlagLong)
        out.writeLong(body.length.toLong)
      } else {
        out.writeByte(flags)
        out.writeByte(body.length)
      }
      out.write(body)
      out.flush()
    }

    private def readFrame(): (Int, Array[Byte]) = {
      val flags = in.readUnsignedByte()
      val len =
        if ((flags & FlagLong) != 0) in.readLong()
        else in.readUnsignedByte().toLong
      val body = new Array[Byte](len.toInt)
      in.readFully(body)
      (flags, body)
    }

    def close(): Unit = socket.close()
  }

  private def compatible(a: String, b: String): Boolean = (a, b) match {
    case ("PUSH", "PULL") | ("PULL", "PUSH") => true
    case ("PUB", "SUB") | ("SUB", "PUB") => true
    case _ => false
  }

  // ---- sockets over real TCP ----

  /** PUSH or PUB output socket that BINDS and accepts peers. */
  final class BindSocket(socketType: String) {
    require(Set("PUSH", "PUB").contains(socketType))
    private val server = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    private val peers =
      mutable.ArrayBuffer.empty[(Conn, mutable.Set[String])]
    @volatile private var rr = 0
    val port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val conn = new Conn(sock, socketType, asServer = true)
          val peerType = conn.handshake()
          require(compatible(socketType, peerType),
            s"zmtp: $socketType cannot talk to $peerType")
          val subs = mutable.Set.empty[String]
          if (socketType == "PUB") {
            // watch for \x01topic subscribe / \x00topic cancel
            val w = new Thread(() => {
              try {
                var m = conn.receiveMessage()
                while (m != null) {
                  val body = m.head
                  if (body.nonEmpty) {
                    val topic = new String(body.drop(1), UTF_8)
                    if (body(0) == 1) subs.synchronized(subs += topic)
                    else if (body(0) == 0) subs.synchronized(subs -= topic)
                  }
                  m = conn.receiveMessage()
                }
              } catch { case _: Exception => () }
            })
            w.setDaemon(true)
            w.start()
          }
          peers.synchronized { peers += ((conn, subs)) }
        }
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def awaitPeers(n: Int, timeoutMs: Long = 5000): Unit = {
      val t0 = System.currentTimeMillis()
      while (peers.synchronized(peers.size) < n) {
        require(System.currentTimeMillis() - t0 < timeoutMs,
          "zmtp: timed out waiting for peers")
        Thread.sleep(5)
      }
    }

    /** PUSH: round-robin one peer. PUB: fan out to prefix-matching
      * subscribers (silently dropped when none match — PUB semantics).
      */
    def send(parts: Seq[Array[Byte]]): Unit = peers.synchronized {
      require(peers.nonEmpty, "zmtp: no connected peers")
      if (socketType == "PUSH") {
        val (conn, _) = peers(rr % peers.size)
        rr += 1
        conn.sendMessage(parts)
      } else {
        val topic = new String(parts.head, UTF_8)
        peers.foreach { case (conn, subs) =>
          val hit = subs.synchronized(
            subs.exists(f => topic.startsWith(f)))
          if (hit) conn.sendMessage(parts)
        }
      }
    }

    def close(): Unit = {
      server.close()
      peers.synchronized(peers.foreach(_._1.close()))
    }
  }

  /** PULL or SUB input socket that CONNECTS to a bound peer. */
  final class ConnectSocket(host: String, port: Int, socketType: String,
                            subFilters: Seq[String] = Nil) {
    require(Set("PULL", "SUB").contains(socketType))
    private val conn = new Conn(new java.net.Socket(host, port),
      socketType, asServer = false)
    private val peerType = conn.handshake()
    require(compatible(socketType, peerType),
      s"zmtp: $socketType cannot talk to $peerType")
    if (socketType == "SUB") {
      require(subFilters.nonEmpty,
        "zmq4: must provide at least one sub filter (\"\" = everything)")
      subFilters.foreach { f =>
        conn.sendMessage(Seq(0x01.toByte +: f.getBytes(UTF_8)))
      }
    }

    def receive(): Seq[Array[Byte]] = conn.receiveMessage()
    def close(): Unit = conn.close()
  }

  // ---- Spark surface ----

  /** Bounded drain: connect, read `count` messages, emit envelope
    * rows (multipart joined per the reference's part handling: each
    * part becomes its own message content line).
    */
  def read(spark: SparkSession, host: String, port: Int,
           socketType: String, count: Int,
           subFilters: Seq[String] = Nil): DataFrame = {
    val sock = new ConnectSocket(host, port, socketType, subFilters)
    val rows = try {
      (0 until count).flatMap { i =>
        val m = sock.receive()
        if (m == null) Nil
        else m.map(part => org.apache.spark.sql.Row(
          new String(part, UTF_8),
          Map("zmq_socket_type" -> socketType), null))
      }
    } finally sock.close()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(8, rows.size))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("metadata",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField("error",
          org.apache.spark.sql.types.StringType))))
  }
}
