package graft.sources

import graft.SparkSpec
import graft.sources.Memcached._

/** memcached text-protocol contracts: storage-command semantics,
  * TTL rules (relative vs absolute, clock-driven), multi-get framing,
  * metadump enumeration, prefix namespacing, and the REAL TCP path.
  */
class MemcachedSpec extends SparkSpec {

  private def fresh = "mct_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("set/get/delete wire round-trip with flags and byte counts") {
    val name = fresh
    val c = new Cache(s"mem://$name")
    assert(c.get("k").isEmpty)
    assert(c.set("k", "hello world"))
    assert(c.get("k").contains("hello world"))
    assert(c.delete("k"))
    assert(!c.delete("k")) // NOT_FOUND second time
    Memcached.drop(name)
  }

  test("add stores only when absent; replace only when present") {
    val name = fresh
    val c = new Cache(s"mem://$name")
    assert(c.add("k", "v1"))
    assert(!c.add("k", "v2"))   // NOT_STORED
    assert(c.get("k").contains("v1"))
    assert(c.replace("k", "v3"))
    assert(c.get("k").contains("v3"))
    assert(!c.replace("zzz", "x")) // NOT_STORED on absent key
    Memcached.drop(name)
  }

  test("TTL: relative seconds expire on the injected clock; 0 never") {
    val name = fresh
    val srv = Memcached.named(name)
    val t0 = 1700000000000L
    srv.now = () => t0
    val c = new Cache(s"mem://$name")
    c.set("short", "x", ttlSec = 60)
    c.set("forever", "y", ttlSec = 0)
    srv.now = () => t0 + 59000
    assert(c.get("short").contains("x"))
    srv.now = () => t0 + 61000
    assert(c.get("short").isEmpty)
    assert(c.get("forever").contains("y"))
    // absolute unix-seconds form (> 30 days)
    c.set("abs", "z", ttlSec = (t0 + 61000) / 1000 + 5)
    assert(c.get("abs").contains("z"))
    srv.now = () => t0 + 70000
    assert(c.get("abs").isEmpty)
    Memcached.drop(name)
  }

  test("multi-get returns only live keys in one round-trip") {
    val name = fresh
    val c = new Cache(s"mem://$name")
    c.set("a", "1"); c.set("b", "2")
    assert(c.getMulti(Seq("a", "missing", "b")) ==
      Map("a" -> "1", "b" -> "2"))
    Memcached.drop(name)
  }

  test("prefix namespaces coexist on one server; metadump filters") {
    val name = fresh
    val c1 = new Cache(s"mem://$name", prefix = "app1:")
    val c2 = new Cache(s"mem://$name", prefix = "app2:")
    c1.set("k", "one"); c2.set("k", "two")
    assert(c1.get("k").contains("one"))
    assert(c2.get("k").contains("two"))
    assert(c1.keys() == Seq("k"))
    val view = Memcached.cacheView(spark, s"mem://$name", "app2:")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(view == Seq(("k", "two")))
    Memcached.drop(name)
  }

  test("incr/decr are numeric server-side ops; decr floors at 0") {
    val name = fresh
    val srv = Memcached.named(name)
    val c = new Cache(s"mem://$name")
    c.set("n", "10")
    assert(srv.exec("incr n 5\r\n") == "15\r\n")
    assert(srv.exec("decr n 100\r\n") == "0\r\n")
    assert(srv.exec("incr missing 1\r\n") == "NOT_FOUND\r\n")
    Memcached.drop(name)
  }

  test("real TCP loopback: the same wire text over a socket") {
    val name = fresh
    val srv = Memcached.named(name)
    val ss = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      try {
        while (!ss.isClosed) {
          val sock = ss.accept()
          new Thread(() => {
            try {
              val in = sock.getInputStream
              val buf = new java.io.ByteArrayOutputStream()
              val tmp = new Array[Byte](4096)
              var n = in.read(tmp)
              while (n > 0) {
                buf.write(tmp, 0, n)
                val req = buf.toString("UTF-8")
                // a storage command needs its data block before exec
                val complete =
                  if (req.startsWith("set") || req.startsWith("add") ||
                      req.startsWith("replace"))
                    req.count(_ == '\n') >= 2
                  else req.endsWith("\r\n")
                if (complete) {
                  sock.getOutputStream.write(srv.exec(req).getBytes("UTF-8"))
                  sock.getOutputStream.flush()
                  buf.reset()
                }
                n = in.read(tmp)
              }
            } catch { case _: Exception => () }
            finally sock.close()
          }).start()
        }
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    try {
      val c = new Cache(s"127.0.0.1:${ss.getLocalPort}")
      assert(c.set("tcp", "payload with spaces"))
      assert(c.get("tcp").contains("payload with spaces"))
      assert(c.delete("tcp"))
    } finally { ss.close(); Memcached.drop(name) }
  }

  test("config cache_resources: memcached backend hydrates the cache view") {
    val name = fresh
    val c = new Cache(s"mem://$name", prefix = "lk:")
    c.set("one", "first"); c.set("two", "second")
    val config =
      s"""input:
         |  generate: { count: 2, mapping: 'root.id = if this.seq == 0 { "one" } else { "two" }' }
         |cache_resources:
         |  - label: mcd
         |    memcached:
         |      addresses: [ "mem://$name" ]
         |      prefix: "lk:"
         |pipeline:
         |  processors:
         |    - cache:
         |        resource: mcd
         |        operator: get
         |        key: '$${! json("id") }'
         |output:
         |  memory: { name: mc_cache_out }
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    val vals = spark.table("mc_cache_out")
      .select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(vals == Seq("first", "second"))
    Memcached.drop(name)
  }
}
