package graft.sources

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** `socket` / `socket_server` connector family
  * (inputs/socket.adoc, inputs/socket_server.adoc, outputs/socket):
  * newline-delimited messages over REAL loopback TCP sockets — the
  * same no-stub convention as [[HttpPushServer]].
  *
  * Scale note: one socket is one ordered byte stream, so the client
  * read and the write are single-consumer paths by nature (the
  * reference's socket output holds one connection too); the drained
  * messages parallelize downstream like any bounded source.
  */
object Tcp {

  /** `socket_server` push input: accepts any number of connections,
    * each feeding newline-delimited UTF-8 messages into one arrival-
    * ordered log; [[drain]] snapshots it into the message envelope.
    */
  final class LineServer {
    private val received = ArrayBuffer.empty[String]
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    @volatile private var running = true

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => handle(sock)).start()
        } catch { case _: Exception => () } // closed during accept
      }
    }, "tcp-line-server-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(sock: Socket): Unit =
      try {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .foreach(l => received.synchronized { received += l; () })
      } finally sock.close()

    def port: Int = server.getLocalPort
    def address: String = s"127.0.0.1:$port"
    Tcp.servers.put(address, this)

    /** Wait until at least `n` messages arrived (push inputs are
      * asynchronous; tests need a quiescence point).
      */
    def awaitCount(n: Int, timeoutMs: Long = 5000): Unit = {
      val deadline = System.currentTimeMillis + timeoutMs
      while (received.synchronized(received.size) < n &&
             System.currentTimeMillis < deadline) Thread.sleep(10)
    }

    def drain(spark: SparkSession): DataFrame = {
      val snap = received.synchronized { val s = received.toVector; s }
      val rows = snap.zipWithIndex.map { case (v, i) =>
        Row(v, Map.empty[String, String], null, i.toLong)
      }
      val slices = math.max(1, math.min(
        spark.sparkContext.defaultParallelism, rows.length / 1024 + 1))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
    }

    def stop(): Unit = {
      running = false; server.close()
      Tcp.servers.remove(address); ()
    }
  }

  /** Live [[LineServer]]s by `host:port` — the config-form seam: the
    * YAML's own `address` field resolves to the running server, whose
    * received log the bounded run drains (push inputs snapshot what
    * has arrived, the stdin treatment).
    */
  private val servers =
    new java.util.concurrent.ConcurrentHashMap[String, LineServer]()
  def serverAt(address: String): Option[LineServer] =
    Option(servers.get(address))

  /** `socket` input (client mode): connect to `host:port`, read
    * newline-delimited messages to EOF — a bounded snapshot of what
    * the peer serves.
    */
  def read(spark: SparkSession, address: String): DataFrame = {
    val Array(host, port) = address.split(":", 2)
    val sock = new Socket(host, port.toInt)
    val lines =
      try {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          sock.getInputStream, StandardCharsets.UTF_8))
        Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
      } finally sock.close()
    val rows = lines.zipWithIndex.map { case (v, i) =>
      Row(v, Map.empty[String, String], null, i.toLong)
    }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 1024 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  /** `socket` output: one connection, newline-delimited messages in
    * `__seq` order (a socket is one ordered stream — the driver-side
    * drain is the honest shape, like stdout).
    */
  def write(df: DataFrame, address: String): Unit = {
    val Array(host, port) = address.split(":", 2)
    val ordered =
      if (df.columns.contains("__seq"))
        df.orderBy(org.apache.spark.sql.functions.col("__seq"))
      else df
    // toLocalIterator keeps driver memory O(one partition), not
    // O(result) — the stream is still drained in __seq order
    val values = ordered.select("value").toLocalIterator()
    val sock = new Socket(host, port.toInt)
    try {
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        sock.getOutputStream, StandardCharsets.UTF_8))
      values.forEachRemaining { r => out.write(r.getString(0)); out.write("\n") }
      out.flush()
    } finally sock.close()
  }
}
