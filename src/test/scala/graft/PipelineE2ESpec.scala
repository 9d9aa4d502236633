package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.blobl.Blobl
import graft.operators.FlowControl
import graft.streaming.Windows

/** End-to-end pipeline shapes: the reference's input → processors →
  * output composition running as ONE Spark job, in both batch and
  * streaming forms.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("batch e2e: generate → mapping → switch-route → counts") {
    val src = sources.Sources.generate(spark, 100,
      """root.id = this.seq
        |root.bucket = if this.seq % 3 == 0 { "fizz" } else { "plain" }""".stripMargin)
    val parsed = src.select(
      get_json_object(col("value"), "$.id").cast("long").as("id"),
      get_json_object(col("value"), "$.bucket").as("bucket"))
    val routed = parsed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(routed == Seq(("fizz", 34L), ("plain", 66L)))
  }

  test("streaming e2e: stream → bloblang mapping → tumbling window → memory sink") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val stream = mem.toDF.toDF("value", "event_ts")
    // mapping enriches each message; window aggregates by category
    val mapped = Blobl.mapping(stream,
      """root.cat = this.kind.uppercase()
        |root.amt = this.amount""".stripMargin)
      .select(col("event_ts"),
        get_json_object(col("value"), "$.cat").as("cat"),
        get_json_object(col("value"), "$.amt").cast("double").as("amt"))
    val windowed = Windows.tumbling(mapped, "event_ts", "1 hour", None,
      Seq(col("cat")), Seq(sum(col("amt")).as("total")))
    val q = windowed.writeStream.format("memory").queryName("e2e")
      .outputMode("complete").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      mem.addData(
        ("""{"kind":"sale","amount":10.5}""", ts("2021-01-01 09:05:00")),
        ("""{"kind":"sale","amount":4.5}""", ts("2021-01-01 09:20:00")),
        ("""{"kind":"refund","amount":3.0}""", ts("2021-01-01 09:40:00")),
        ("""{"kind":"sale","amount":7.0}""", ts("2021-01-01 10:10:00")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT cat, total FROM e2e ORDER BY window_start, cat")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(rows == Seq(("REFUND", 3.0), ("SALE", 15.0), ("SALE", 7.0)))
    } finally q.stop()
  }

  test("error channel e2e: bad messages route to the reject branch") {
    val df = Seq(
      """{"k":1}""", """not json at all""", """{"k":5}""").toDF("value")
    val tried = FlowControl.tryColumn(df, "k",
      get_json_object(col("value"), "$.k").cast("long"),
      get_json_object(col("value"), "$.k").isNull,
      concat(lit("unparseable: "), col("value")))
    val (ok, rejected) = FlowControl.rejectErrored(tried)
    assert(ok.count() == 2 && rejected.count() == 1)
    assert(rejected.select("error").head().getString(0).startsWith("unparseable"))
  }
}
