package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Couchbase._

/** couchbase KV binary-protocol contracts: frame layout golden bytes,
  * vbucket routing validation, status semantics, the processor's
  * per-item error channel, and the real TCP path.
  */
class CouchbaseSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "cbt_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("frame layout: 24-byte header with documented field offsets") {
    val f = Frame(0x80, OpSet, 513, 7, 0L, Codec.setExtras(0, 0), "k",
      "vv".getBytes("UTF-8"))
    val b = Codec.encode(f)
    assert((b(0) & 0xFF) == 0x80)           // magic
    assert((b(1) & 0xFF) == OpSet)          // opcode
    assert(((b(2) & 0xFF) << 8 | (b(3) & 0xFF)) == 1)  // key length
    assert((b(4) & 0xFF) == 8)              // extras length
    assert(((b(6) & 0xFF) << 8 | (b(7) & 0xFF)) == 513) // vbucket
    val totalBody = (8 until 12).foldLeft(0)((a, i) => (a << 8) | (b(i) & 0xFF))
    assert(totalBody == 8 + 1 + 2)          // extras + key + value
    assert(b.length == 24 + totalBody)
    val (rt, consumed) = Codec.decode(b)
    assert(consumed == b.length)
    assert(rt.key == "k" && new String(rt.value, "UTF-8") == "vv")
    assert(rt.vbucketOrStatus == 513 && rt.opaque == 7)
  }

  test("vbucket mapping is CRC32-derived and stable; server validates it") {
    assert(vbucketOf("somekey") == vbucketOf("somekey"))
    assert((0 until NumVbuckets).contains(vbucketOf("another")))
    val srv = new Server
    // deliberately wrong vbucket → NOT_MY_VBUCKET
    val wrong = Frame(0x80, OpSet, (vbucketOf("k") + 1) % NumVbuckets,
      1, 0L, Codec.setExtras(0, 0), "k", "v".getBytes("UTF-8"))
    val (resp, _) = Codec.decode(srv.handle(Codec.encode(wrong)))
    assert(resp.vbucketOrStatus == StatusWrongVbucket)
  }

  test("status semantics: add-exists, replace/delete-missing, get-miss") {
    val name = fresh
    Couchbase.named(name)
    val c = new Client(s"mem://$name")
    assert(c.get("k").isEmpty)
    assert(c.insert("k", "v1") == StatusOk)
    assert(c.insert("k", "v2") == StatusExists)
    assert(c.get("k").contains("v1"))
    assert(c.replace("k", "v3") == StatusOk)
    assert(c.replace("zzz", "x") == StatusNotFound)
    assert(c.remove("k") == StatusOk)
    assert(c.remove("k") == StatusNotFound)
    Couchbase.drop(name)
  }

  test("processor: get replaces content, misses and conflicts hit the error channel") {
    val name = fresh
    Couchbase.named(name)
    val url = s"mem://$name"
    val docs = Seq(("a", """{"v":1}"""), ("b", """{"v":2}"""))
      .toDF("id", "value")
    Couchbase.processor(docs, url, "upsert", col("id")).count()
    // insert conflict on existing key
    val ins = Couchbase.processor(docs.limit(1), url, "insert", col("id"))
      .select("error").collect()
    assert(ins.head.getString(0).contains("key exists"))
    // get: hit replaces value, miss errors
    val got = Couchbase.processor(
        Seq(("a", null: String), ("nope", null: String)).toDF("id", "value"),
        url, "get", col("id"))
      .select("id", "value", "error").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got("a") == (("""{"v":1}""", null)))
    assert(got("nope")._1 == null)
    assert(got("nope")._2.contains("key not found"))
    Couchbase.drop(name)
  }

  test("real TCP loopback: frames over a socket") {
    val name = fresh
    val srv = Couchbase.named(name)
    val ss = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      try {
        while (!ss.isClosed) {
          val sock = ss.accept()
          new Thread(() => {
            try {
              val in = sock.getInputStream
              val head = new Array[Byte](24)
              var n = in.readNBytes(head, 0, 24)
              while (n == 24) {
                val totalBody = (8 until 12).foldLeft(0)((a, i) =>
                  (a << 8) | (head(i) & 0xFF))
                val body = new Array[Byte](totalBody)
                in.readNBytes(body, 0, totalBody)
                sock.getOutputStream.write(srv.handle(head ++ body))
                sock.getOutputStream.flush()
                n = in.readNBytes(head, 0, 24)
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
      val c = new Client(s"127.0.0.1:${ss.getLocalPort}")
      assert(c.upsert("tcpkey", "tcp value") == StatusOk)
      assert(c.get("tcpkey").contains("tcp value"))
    } finally { ss.close(); Couchbase.drop(name) }
  }
}
