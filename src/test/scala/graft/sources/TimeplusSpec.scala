package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Timeplus._

/** timeplus contracts: SSE framing, the query metadata handshake,
  * target-specific ingest paths, api-key auth.
  */
class TimeplusSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "tpt_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("SSE parsing: multi-line data, comments, named events, CRLF") {
    val body =
      "event: query\r\ndata: {\"a\":1}\r\n\r\n" +
        ": heartbeat comment\n\n" +
        "data: line1\ndata: line2\n\n" +
        "data: tail-without-trailing-blank"
    val evs = Sse.parse(body)
    assert(evs == Seq(
      Sse.Event("query", "{\"a\":1}"),
      Sse.Event("", "line1\nline2"),
      Sse.Event("", "tail-without-trailing-blank")))
    // render/parse round-trip
    assert(Sse.parse(Sse.render(evs)) == evs)
  }

  test("ingest paths differ per target (client.go:62)") {
    assert(ingestPath("timeplus", "ws1", "iot") ==
      "/ws1/api/v1beta2/streams/iot/ingest")
    assert(ingestPath("timeplusd", "ignored", "iot") ==
      "/timeplusd/v1/ingest/streams/iot")
    assert(queryPath("ws1") == "/ws1/api/v1beta2/queries")
  }

  test("ingest: columnar payload lands typed; api key header travels") {
    val name = fresh
    val svc = Timeplus.named(name)
    val docs = Seq("""{"id":1,"s":"a"}""", """{"id":2,"s":"b"}""")
      .toDF("value")
    Timeplus.write(docs, s"mem://$name", "t1", Seq("id", "s"),
      apikey = "secret-key")
    assert(svc.lastApiKey == "secret-key")
    val (cols, rows) = svc.streams("t1")
    assert(cols == Seq("id", "s"))
    assert(rows.map(_.mkString(",")).sorted.toSeq ==
      Seq("""1,"a"""", """2,"b""""))
    Timeplus.drop(name)
  }

  test("query: metadata event first, multi-row events unpack per row") {
    val name = fresh
    Timeplus.named(name)
    val docs = (1 to 250).map(i => s"""{"id":$i}""").toDF("value")
    Timeplus.write(docs, s"mem://$name", "big", Seq("id"))
    // 250 rows at 100 rows per SSE event → 3 data events, one message
    // per row after unpacking
    val out = Timeplus.read(spark, s"mem://$name", "select * from big")
    assert(out.count() == 250)
    val ids = out.select(get_json_object(col("value"), "$.id")
      .cast("long")).as[Long].collect().sorted
    assert(ids.head == 1 && ids.last == 250)
    Timeplus.drop(name)
  }

  test("query of an unknown stream fails loudly") {
    val name = fresh
    Timeplus.named(name)
    val e = intercept[IllegalStateException] {
      Timeplus.read(spark, s"mem://$name", "select * from ghost")
    }
    assert(e.getMessage.contains("404"))
    Timeplus.drop(name)
  }
}
