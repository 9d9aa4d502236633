package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming golden tests: the reference's traffic-light
  * windowing example (buffers/system_window.adoc:85-127) and the TTL
  * dedupe fixture (config/test/deduplicate.yaml:1-37) executed over
  * MemoryStream micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("traffic-light tumbling window matches the reference example") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String, Int)]
    val df = mem.toDF.toDF("traffic_light", "created_at", "registration_plate", "passengers")
    val out = Windows.trafficLightSummary(df, "1 hour", lateness = None)
    val q = out.writeStream.format("memory").queryName("tl")
      .outputMode("complete").start()
    try {
      mem.addData(
        ("L1", ts("2021-08-07 09:10:00"), "AB1", 3),
        ("L1", ts("2021-08-07 09:20:00"), "CD2", 1),
        ("L1", ts("2021-08-07 09:30:00"), "AB1", 3), // same car again
        ("L2", ts("2021-08-07 09:40:00"), "EF3", 2),
        ("L1", ts("2021-08-07 10:15:00"), "GH4", 5)) // next window
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT traffic_light, created_at, total_cars, passengers
          |FROM tl ORDER BY created_at, traffic_light""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(rows == Seq(
        ("L1", "2021-08-07T10:00:00Z", 2L, 7L),
        ("L2", "2021-08-07T10:00:00Z", 1L, 2L),
        ("L1", "2021-08-07T11:00:00Z", 1L, 5L)))
    } finally q.stop()
  }

  test("allowed_lateness watermark drops too-late events") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Int)]
    val df = mem.toDF.toDF("k", "event_ts", "v")
    val out = Windows.tumbling(df, "event_ts", "1 hour", Some("10 minutes"),
      Seq(col("k")), Seq(sum(col("v")).as("total")))
    val q = out.writeStream.format("memory").queryName("latew")
      .outputMode("append").start()
    try {
      mem.addData(("a", ts("2021-01-01 09:10:00"), 1),
                  ("a", ts("2021-01-01 09:20:00"), 2))
      q.processAllAvailable()
      // advance the watermark far past 10:00 + lateness → window emits
      mem.addData(("a", ts("2021-01-01 12:00:00"), 7))
      q.processAllAvailable()
      // this event's window (09:00) is behind the watermark → dropped
      mem.addData(("a", ts("2021-01-01 09:59:00"), 100))
      q.processAllAvailable()
      mem.addData(("a", ts("2021-01-01 14:00:00"), 9))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, total FROM latew ORDER BY window_start")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
      // 09:00 window total stays 3 — the late 100 never lands
      assert(rows.headOption.contains(("2021-01-01 09:00:00.0", 3L)))
      assert(!rows.exists(_._2 == 103L))
    } finally q.stop()
  }

  test("TTL dedupe drops repeats within the watermark (deduplicate.yaml)") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF.toDF("content", "event_ts")
    val out = StreamDedupe.withinWatermark(df, "event_ts", "1 minute", Seq("content"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      // reference fixture shape: repeated content within the TTL window
      mem.addData(("foo", ts("2021-01-01 00:00:01")),
                  ("bar", ts("2021-01-01 00:00:02")),
                  ("foo", ts("2021-01-01 00:00:30"))) // dup within 1m
      q.processAllAvailable()
      val n1 = spark.sql("SELECT COUNT(*) FROM dedup").collect()(0).getLong(0)
      assert(n1 == 2) // foo once, bar once
    } finally q.stop()
  }

  test("session window groups events by inactivity gap") {
    // batch-mode check of the same helper the streaming path uses
    val df = Seq(
      ("u1", ts("2021-01-01 09:00:00")),
      ("u1", ts("2021-01-01 09:10:00")),
      ("u1", ts("2021-01-01 13:00:00")), // > 1h gap → new session
      ("u2", ts("2021-01-01 09:05:00"))).toDF("user", "event_ts")
    val out = Windows.session(df, "event_ts", "1 hour", None,
      Seq(col("user")), Seq(count(lit(1)).as("n")))
      .select(col("user"), col("window_start"), col("n"))
      .orderBy(col("user"), col("window_start"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSeq
    assert(out == Seq(
      ("u1", "2021-01-01 09:00:00.0", 2L),
      ("u1", "2021-01-01 13:00:00.0", 1L),
      ("u2", "2021-01-01 09:05:00.0", 1L)))
  }

  test("batch TTL dedupe matches sequential cache semantics") {
    val df = Seq(
      (1L, "k1", ts("2021-01-01 00:00:00")),
      (2L, "k1", ts("2021-01-01 00:00:30")), // within 60s of #1 → drop
      (3L, "k1", ts("2021-01-01 00:02:00")), // 90s after #2 → keep
      (4L, "k2", ts("2021-01-01 00:00:10"))).toDF("id", "k", "event_ts")
    val out = StreamDedupe.ttlBatch(df, col("event_ts"), col("id"), 60, Seq(col("k")))
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L, 4L))
  }

  test("session window merges and emits in STREAMING mode with watermark") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Int)]
    val df = mem.toDF.toDF("user", "event_ts", "v")
    val out = Windows.session(df, "event_ts", "30 minutes",
      lateness = Some("10 minutes"), Seq(col("user")),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("total")))
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // one session for u1 (two events 10m apart), then advance the
      // watermark far enough to close and emit it
      mem.addData(("u1", ts("2021-01-01 09:00:00"), 1),
                  ("u1", ts("2021-01-01 09:10:00"), 2))
      q.processAllAvailable()
      mem.addData(("u2", ts("2021-01-01 12:00:00"), 7))
      q.processAllAvailable()
      mem.addData(("u2", ts("2021-01-01 14:00:00"), 9))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user, n, total FROM sess ORDER BY window_start")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // u1's merged session (2 events, total 3) must have emitted once
      // its close passed the watermark
      assert(rows.contains(("u1", 2L, 3L)), s"u1 session not emitted: $rows")
    } finally q.stop()
  }
}
