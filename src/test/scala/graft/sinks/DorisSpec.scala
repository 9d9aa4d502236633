package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Http

/** doris_stream_load contracts: FE redirect handshake, label
  * idempotence, group-commit label rule, verdict classification
  * (output_stream_load.go behaviors re-asserted, no code ported).
  */
class DorisSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "drt_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("FE PUT gets 307 + Location; the body lands on the BE only") {
    val name = fresh
    val svc = Doris.named(name)
    Doris.write(Seq("""{"a":1}""", """{"a":2}""").toDF("value").coalesce(1),
      s"mem://$name", Doris.Conf("db1", "t1"))
    assert(svc.feRequests == 1, "one FE round-trip per batch")
    assert(svc.rows("db1", "t1") == Seq("""{"a":1}""", """{"a":2}"""))
    Doris.drop(name)
  }

  test("label replay answers Label Already Exists/FINISHED and is acked") {
    val name = fresh
    val svc = Doris.named(name)
    val client = Doris.memClient(name)
    val headers = Map("format" -> "json", "read_json_by_line" -> "true",
      "label" -> "graft_fixed")
    def put(): Http.Response = {
      val fe = client(Seq(Http.Request(
        s"mem://$name/api/db/t/_stream_load", "PUT", headers, ""))).head
      client(Seq(Http.Request(fe.headers("location"), "PUT", headers,
        """{"x":1}"""))).head
    }
    val first = put()
    assert(first.body.contains("\"Status\":\"Success\""))
    val second = put()
    assert(second.body.contains("Label Already Exists"))
    assert(second.body.contains("FINISHED"))
    assert(svc.rows("db", "t").size == 1, "replayed label must not re-load")
    Doris.drop(name)
  }

  test("group_commit modes omit the label (engine forbids both)") {
    val name = fresh
    val svc = Doris.named(name)
    Doris.write(Seq("""{"a":1}""").toDF("value").coalesce(1),
      s"mem://$name", Doris.Conf("db", "t", groupCommit = "async_mode"))
    assert(svc.rows("db", "t").size == 1)
    // the mem service rejects label-less loads UNLESS group commit —
    // so this passing proves no label header was sent
    Doris.drop(name)
  }

  test("a Fail verdict fails the batch loudly") {
    val name = fresh
    Doris.named(name)
    val e = intercept[org.apache.spark.SparkException] {
      Doris.write(Seq("bad").toDF("value").coalesce(1), s"mem://$name",
        Doris.Conf("db", "t", format = "json", groupCommit = "off_mode"),
        client = reqs => reqs.map { q =>
          if (q.body.isEmpty)
            Http.Response(307, "", Map("location" -> s"mem://$name/be/api/db/t/_stream_load"))
          else Http.Response(200, """{"Status":"Fail","Message":"column mismatch"}""")
        })
    }
    assert(e.getMessage.contains("Fail") ||
      Option(e.getCause).exists(_.getMessage.contains("Fail")))
    Doris.drop(name)
  }

  test("csv format carries separator/delimiter headers") {
    val name = fresh
    val svc = Doris.named(name)
    Doris.write(Seq("1|a", "2|b").toDF("value").coalesce(1),
      s"mem://$name", Doris.Conf("db", "t", format = "csv",
        columnSeparator = "|", lineDelimiter = "\n"))
    assert(svc.rows("db", "t") == Seq("1|a", "2|b"))
    Doris.drop(name)
  }
}
