package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Bolt
import graft.sources.PackStream

/** Bolt/PackStream contracts: the serialization type matrix at its
  * width boundaries, chunked framing, handshake negotiation, auth and
  * failure semantics — all over the real TCP loopback server.
  */
class BoltSpec extends SparkSpec {
  import spark.implicits._

  private def rt(v: Any): Any = PackStream.decode(PackStream.encode(v))

  test("packstream scalars: nulls, booleans, float64, integer width classes") {
    assert(rt(null) == null)
    assert(rt(true) == true)
    assert(rt(false) == false)
    assert(rt(3.25) == 3.25)
    // the five integer encodings at their boundaries
    Seq(-16L, 127L,                       // tiny
        -17L, -128L,                      // INT_8
        128L, 32767L, -32768L,            // INT_16
        32768L, Int.MaxValue.toLong,      // INT_32
        Int.MaxValue + 1L, Long.MaxValue, Long.MinValue) // INT_64
      .foreach { n => assert(rt(n) == n, s"int $n") }
    // encoded widths are the minimal class
    assert(PackStream.encode(100L).length == 1)
    assert(PackStream.encode(-100L).length == 2)
    assert(PackStream.encode(1000L).length == 3)
    assert(PackStream.encode(100000L).length == 5)
    assert(PackStream.encode(10000000000L).length == 9)
  }

  test("packstream strings/lists/maps at the 15/255/65535 boundaries") {
    Seq(0, 15, 16, 255, 256, 65535, 65536).foreach { n =>
      val s = "x" * n
      assert(rt(s) == s, s"string len $n")
    }
    val l300 = (1 to 300).map(_.toLong)
    assert(rt(l300) == l300)
    val m20 = (1 to 20).map(i => s"k$i" -> i.toLong).toMap
    assert(rt(m20) == m20)
    val nested = Map("a" -> Seq(1L, Map("b" -> "c")), "d" -> null)
    assert(rt(nested) == nested)
  }

  test("chunked framing splits >64KiB messages and reassembles") {
    val server = new Bolt.Server(password = "pw")
    val port = server.start()
    try {
      val conn = Bolt.connect("127.0.0.1", port, "neo4j", "pw")
      try {
        val big = "y" * 200000 // 3+ chunks of 0xFFFF
        conn.run("CREATE (n:Big {payload: $p, k: $k})",
          Map("p" -> big, "k" -> 1L))
        val (cols, rows) = conn.run(
          "MATCH (n:Big) RETURN n.payload, n.k", Map.empty)
        assert(cols == Seq("n.payload", "n.k"))
        assert(rows.head.head == big)
      } finally conn.close()
    } finally server.stop()
  }

  test("handshake negotiates a 4.x version from the proposal list") {
    val server = new Bolt.Server(password = "pw")
    val port = server.start()
    try {
      val conn = Bolt.connect("127.0.0.1", port, "neo4j", "pw")
      conn.close()
      assert((server.negotiated & 0xFF00) == 0x0400)
    } finally server.stop()
  }

  test("wrong credentials fail HELLO with the documented code") {
    val server = new Bolt.Server(password = "right")
    val port = server.start()
    try {
      val e = intercept[Bolt.BoltError] {
        Bolt.connect("127.0.0.1", port, "neo4j", "wrong")
      }
      assert(e.code == "Neo.ClientError.Security.Unauthorized")
    } finally server.stop()
  }

  test("a bad statement answers FAILURE; RESET recovers the connection") {
    val server = new Bolt.Server(password = "pw")
    val port = server.start()
    try {
      val conn = Bolt.connect("127.0.0.1", port, "neo4j", "pw")
      try {
        val e = intercept[Bolt.BoltError] {
          conn.run("DROP EVERYTHING", Map.empty)
        }
        assert(e.code.startsWith("Neo.ClientError"))
        conn.reset()
        conn.run("CREATE (n:T {k: $k})", Map("k" -> 5L))
        val (_, rows) = conn.run("MATCH (n:T) RETURN n.k", Map.empty)
        assert(rows == Seq(Seq(5L)))
      } finally conn.close()
    } finally server.stop()
  }

  test("where predicates, order desc and limit execute server-side") {
    val server = new Bolt.Server(password = "pw")
    val port = server.start()
    try {
      val conn = Bolt.connect("127.0.0.1", port, "neo4j", "pw")
      try {
        Seq(("a", 1L), ("b", 2L), ("a", 3L), ("a", 9L)).foreach {
          case (g, n) => conn.run(
            "CREATE (x:Item {grp: $g, n: $n})", Map("g" -> g, "n" -> n))
        }
        val (_, rows) = conn.run(
          "MATCH (x:Item) WHERE x.grp = $g RETURN x.n ORDER BY x.n DESC LIMIT 2",
          Map("g" -> "a"))
        assert(rows == Seq(Seq(9L), Seq(3L)))
      } finally conn.close()
    } finally server.stop()
  }

  test("config output form: cypher with args_mapping columns") {
    val server = new Bolt.Server(password = "pw")
    val port = server.start()
    try {
      val config =
        s"""input:
           |  generate: { count: 4, mapping: 'root.id = this.seq' }
           |output:
           |  cypher:
           |    uri: "bolt://127.0.0.1:$port"
           |    cypher: "CREATE (n:Gen {id: $$id})"
           |    database_name: ""
           |    basic_auth: { user: neo4j, password: pw }
           |    args_mapping: 'root.id = this.id'
           |""".stripMargin
      graft.config.Pipeline.run(spark, config)
      assert(server.graph.nodes.size == 4)
      assert(server.graph.nodes.map(_._2("id")).toSet ==
        Set(0L, 1L, 2L, 3L))
    } finally server.stop()
  }
}
