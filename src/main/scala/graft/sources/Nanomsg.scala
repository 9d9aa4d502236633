package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `nanomsg` input/output (internal/impl/nanomsg — contract only, no
  * code ported: the reference binds mangos; this implements the
  * PUBLIC nanomsg SP-over-TCP mapping, RFC-draft sp-tcp-mapping-01,
  * directly):
  *
  *   - connection handshake: both sides send the 8-byte header
  *     `0x00 'S' 'P' 0x00  <protocol-id u16>  0x00 0x00` and validate
  *     the PEER's protocol id against the SP pairing table
  *     (PUSH 0x50 ↔ PULL 0x51, PUB 0x20 ↔ SUB 0x21);
  *   - messages: u64 big-endian length prefix + body;
  *   - SUB filtering is RECEIVER-side prefix matching on the message
  *     body (nanomsg's model — the publisher sends everything, unlike
  *     ZMTP's publisher-side subscriptions).
  *
  * Only PULL and SUB inputs exist, mirroring the reference's enum.
  */
object Nanomsg {

  val ProtoIds: Map[String, Int] =
    Map("PUSH" -> 0x50, "PULL" -> 0x51, "PUB" -> 0x20, "SUB" -> 0x21)
  private val Peers: Map[Int, Int] =
    Map(0x50 -> 0x51, 0x51 -> 0x50, 0x20 -> 0x21, 0x21 -> 0x20)

  final class Conn(socket: java.net.Socket, socketType: String) {
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))

    def handshake(): Unit = {
      val id = ProtoIds(socketType)
      out.write(Array[Byte](0, 'S'.toByte, 'P'.toByte, 0,
        ((id >> 8) & 0xFF).toByte, (id & 0xFF).toByte, 0, 0))
      out.flush()
      val peer = new Array[Byte](8)
      in.readFully(peer)
      require(peer(0) == 0 && peer(1) == 'S' && peer(2) == 'P' &&
        peer(3) == 0, "nanomsg: bad SP header")
      val peerId = ((peer(4) & 0xFF) << 8) | (peer(5) & 0xFF)
      require(Peers(id) == peerId,
        f"nanomsg: protocol $id%04x cannot pair with $peerId%04x")
    }

    def send(body: Array[Byte]): Unit = {
      out.writeLong(body.length.toLong)
      out.write(body)
      out.flush()
    }

    def receive(): Array[Byte] = {
      val len =
        try in.readLong()
        catch { case _: java.io.EOFException => return null }
      val body = new Array[Byte](len.toInt)
      in.readFully(body)
      body
    }

    def close(): Unit = socket.close()
  }

  /** Bound PUSH (round-robin) / PUB (fan-out to every peer —
    * filtering is the subscriber's job in SP).
    */
  final class BindSocket(socketType: String) {
    require(Set("PUSH", "PUB").contains(socketType))
    private val server = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    private val peers = mutable.ArrayBuffer.empty[Conn]
    @volatile private var rr = 0
    val port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val conn = new Conn(server.accept(), socketType)
          conn.handshake()
          peers.synchronized { peers += conn }
        }
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def awaitPeers(n: Int, timeoutMs: Long = 5000): Unit = {
      val t0 = System.currentTimeMillis()
      while (peers.synchronized(peers.size) < n) {
        require(System.currentTimeMillis() - t0 < timeoutMs,
          "nanomsg: timed out waiting for peers")
        Thread.sleep(5)
      }
    }

    def send(body: Array[Byte]): Unit = peers.synchronized {
      require(peers.nonEmpty, "nanomsg: no connected peers")
      if (socketType == "PUSH") {
        peers(rr % peers.size).send(body)
        rr += 1
      } else peers.foreach(_.send(body))
    }

    def close(): Unit = {
      server.close()
      peers.synchronized(peers.foreach(_.close()))
    }
  }

  final class ConnectSocket(host: String, port: Int, socketType: String,
                            subFilters: Seq[String] = Nil) {
    require(Set("PULL", "SUB").contains(socketType),
      "nanomsg: only PULL and SUB inputs are supported")
    if (socketType == "SUB")
      require(subFilters.nonEmpty,
        "nanomsg: must provide at least one sub filter (\"\" = everything)")
    private val conn = new Conn(new java.net.Socket(host, port), socketType)
    conn.handshake()

    /** Next message passing the receiver-side prefix filters. */
    def receive(): Array[Byte] = {
      var m = conn.receive()
      if (socketType == "SUB") {
        while (m != null && !subFilters.exists(f =>
            new String(m, UTF_8).startsWith(f)))
          m = conn.receive()
      }
      m
    }

    def close(): Unit = conn.close()
  }

  /** Bounded drain into envelope rows. */
  def read(spark: SparkSession, host: String, port: Int,
           socketType: String, count: Int,
           subFilters: Seq[String] = Nil): DataFrame = {
    val sock = new ConnectSocket(host, port, socketType, subFilters)
    val rows = try {
      (0 until count).flatMap { _ =>
        Option(sock.receive()).map(b => org.apache.spark.sql.Row(
          new String(b, UTF_8),
          Map("nanomsg_socket_type" -> socketType), null))
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

  /** `nanomsg` OUTPUT (outputs/nanomsg.adoc — socket types push/pub):
    * one connecting PUSH/PUB socket per partition; the bound peer is
    * the consumer side, matching the reference's connect-mode default.
    */
  def write(df: DataFrame, host: String, port: Int,
            socketType: String): Unit = {
    require(Set("PUSH", "PUB").contains(socketType),
      "nanomsg: only PUSH and PUB outputs are supported")
    val (h, p, st) = (host, port, socketType)
    df.select(org.apache.spark.sql.functions.col("value").cast("string"))
      .rdd.foreachPartition { it =>
        if (it.hasNext) {
          val conn = new Conn(new java.net.Socket(h, p), st)
          conn.handshake()
          try it.foreach(r => conn.send(r.getString(0).getBytes(UTF_8)))
          finally conn.close()
        }
      }
  }
}
