package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** gcp_bigquery_write_api contract (internal/impl/gcp/enterprise/
  * bigquery/output.go): descriptor round-trip, default vs pending
  * streams, offsets, finalize/commit lifecycle, auth.
  */
class BigQueryWriteApiSpec extends SparkSpec {
  import spark.implicits._
  import BigQueryWriteApi._

  private val mapper = new ObjectMapper()
  private val fields = Seq(Field("name", "STRING"), Field("n", "INT64"),
    Field("score", "DOUBLE"), Field("ok", "BOOL"))
  private val parent = "projects/p/datasets/d/tables/t"

  test("descriptor and rows round-trip the proto wire") {
    val desc = descriptorProto("Row", fields)
    assert(parseDescriptor(desc) == fields)
    val row = encodeRow(mapper.readTree(
      """{"name":"a","n":"42","score":1.5,"ok":true}"""), fields)
    val back = mapper.readTree(decodeRow(row, fields).toString)
    assert(back.get("name").asText == "a" && back.get("n").asLong == 42L &&
      back.get("score").asDouble == 1.5 && back.get("ok").asBoolean)
  }

  test("default stream lands rows immediately (at-least-once)") {
    val srv = new Server("bq-token")
    try {
      write((1 to 25).map(i => s"""{"name":"r$i","n":$i}""").toDF("value"),
        "127.0.0.1", srv.port, "bq-token", "p", "d", "t", fields,
        mode = "default_stream", batchSize = 10)
      assert(srv.committed(parent).size == 25)
      assert(srv.uncommittedStreams == 0)
    } finally srv.stop()
  }

  test("pending stream: append→finalize→commit is atomic; post-finalize appends refused") {
    val srv = new Server("bq-token")
    try {
      val stream = createPendingStream("127.0.0.1", srv.port, "bq-token",
        parent)
      val desc = descriptorProto("Row", fields)
      val rows = (1 to 5).map(i =>
        encodeRow(mapper.readTree(s"""{"name":"x$i","n":$i}"""), fields))
      assert(appendRows("127.0.0.1", srv.port, "bq-token", stream, 0L,
        desc, rows) == 4L, "ack = last sequential offset")
      assert(srv.committed(parent).isEmpty,
        "pending rows invisible before commit")
      // commit before finalize must fail
      intercept[IllegalStateException] {
        batchCommit("127.0.0.1", srv.port, "bq-token", parent, Seq(stream))
      }
      assert(finalizeStream("127.0.0.1", srv.port, "bq-token", stream) == 5L)
      intercept[IllegalStateException] { // append after finalize
        appendRows("127.0.0.1", srv.port, "bq-token", stream, 5L, desc, rows)
      }
      batchCommit("127.0.0.1", srv.port, "bq-token", parent, Seq(stream))
      assert(srv.committed(parent).size == 5)
    } finally srv.stop()
  }

  test("pending mode end-to-end from a dataframe; bad token rejected") {
    val srv = new Server("bq-token")
    try {
      write((1 to 40).map(i => s"""{"name":"p$i","n":$i,"score":$i.5}""")
          .toDF("value"),
        "127.0.0.1", srv.port, "bq-token", "p", "d", "t", fields,
        mode = "pending_stream", batchSize = 16)
      val got = srv.committed(parent).map(mapper.readTree)
      assert(got.size == 40)
      assert(got.map(_.get("n").asInt).sorted == (1 to 40))
      assert(got.find(_.get("n").asInt == 3).get.get("score").asDouble == 3.5)
      intercept[Exception] {
        write(Seq("""{"name":"z"}""").toDF("value"),
          "127.0.0.1", srv.port, "WRONG", "p", "d", "t", fields)
      }
    } finally srv.stop()
  }
}
