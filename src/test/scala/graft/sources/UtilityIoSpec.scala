package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Utility connector contracts: inproc handoff, sequence concat,
  * socket/socket_server over real loopback TCP, stdout drain.
  */
class UtilityIoSpec extends SparkSpec {
  import spark.implicits._

  test("inproc: output registers an id a sibling pipeline consumes") {
    graft.config.Pipeline.run(spark,
      """input:
        |  generate: { count: 3, mapping: 'root.id = this.seq' }
        |output:
        |  inproc: handoff1
        |""".stripMargin)
    graft.config.Pipeline.run(spark,
      """input:
        |  inproc: handoff1
        |pipeline:
        |  processors:
        |    - mapping: 'root.id = this.id + 100'
        |output: { memory: { name: ip_rt } }
        |""".stripMargin)
    val got = spark.table("ip_rt")
      .select(get_json_object($"value", "$.id").cast("long"))
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(100L, 101L, 102L))
  }

  test("sequence: children consumed in order, first to exhaustion") {
    val df = graft.config.Pipeline.build(spark,
      """input:
        |  sequence:
        |    inputs:
        |      - generate: { count: 2, mapping: 'root.src = "a" + this.seq.string()' }
        |      - generate: { count: 2, mapping: 'root.src = "b" + this.seq.string()' }
        |""".stripMargin)
    val got = df.select(get_json_object($"value", "$.src"))
      .as[String].collect().toSeq
    assert(got.sorted == Seq("a0", "a1", "b0", "b1"))
  }

  test("socket_server push input: real TCP clients feed the drain") {
    val srv = new Tcp.LineServer
    try {
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      (0 until 4).foreach(i => out.println(s"""{"n":$i}"""))
      sock.close()
      srv.awaitCount(4)
      val got = srv.drain(spark)
        .select(get_json_object($"value", "$.n").cast("long"))
        .as[Long].collect().toSeq.sorted
      assert(got == Seq(0L, 1L, 2L, 3L))
    } finally srv.stop()
  }

  test("config runner: socket output → socket_server; socket input reads a peer") {
    val srv = new Tcp.LineServer
    try {
      graft.config.Pipeline.run(spark,
        s"""input:
           |  generate: { count: 5, mapping: 'root.id = this.seq' }
           |output:
           |  socket: { network: tcp, address: "${srv.address}" }
           |""".stripMargin)
      srv.awaitCount(5)
      val got = srv.drain(spark)
        .select(get_json_object($"value", "$.id").cast("long"))
        .as[Long].collect().toSeq
      assert(got == Seq(0L, 1L, 2L, 3L, 4L), "__seq order over the wire")

      // socket INPUT: serve those lines back from a one-shot server
      val server = new java.net.ServerSocket(0)
      val feeder = new Thread(() => {
        val s = server.accept()
        val w = new java.io.PrintWriter(s.getOutputStream, true)
        (10 until 13).foreach(i => w.println(s"""{"id":$i}"""))
        s.close()
      })
      feeder.setDaemon(true); feeder.start()
      val read = graft.config.Pipeline.build(spark,
        s"""input:
           |  socket: { network: tcp, address: "127.0.0.1:${server.getLocalPort}" }
           |""".stripMargin)
      val ids = read.select(get_json_object($"value", "$.id").cast("long"))
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(10L, 11L, 12L))
      server.close()
    } finally srv.stop()
  }

  test("stdout output drains value lines in order") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      graft.config.Pipeline.run(spark,
        """input:
          |  generate: { count: 3, mapping: 'root.id = this.seq' }
          |output: { stdout: {} }
          |""".stripMargin)
    }
    val lines = buf.toString("UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    assert(lines == Seq("{\"id\":0}", "{\"id\":1}", "{\"id\":2}"))
  }
}
