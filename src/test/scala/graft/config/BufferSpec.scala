package graft.config

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `buffer:` section contract — system_window assignment semantics
  * (buffers/system_window.adoc): window = batch identity, RFC3339
  * window_end_timestamp metadata, sliding multi-membership.
  */
class BufferSpec extends SparkSpec {
  import spark.implicits._

  test("system_window tumbling: window end is the batch identity + metadata") {
    val df = Pipeline.build(spark,
      """input:
        |  generate: { count: 6, mapping: 'root.id = this.seq
        |root.at = 100 + this.seq * 10' }
        |buffer:
        |  system_window:
        |    timestamp_mapping: 'root = this.at'
        |    size: 30s
        |pipeline:
        |  processors:
        |    - mapping: 'root.id = this.id
        |root.w = meta("window_end_timestamp")
        |root.n = batch_size()'
        |""".stripMargin)
    val got = df.select(
        get_json_object($"value", "$.id").cast("long"),
        get_json_object($"value", "$.w"),
        get_json_object($"value", "$.n").cast("long"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // [start, end) windows: 100,110 → [90,120); 120,130,140 → [120,150);
    // 150 → [150,180)
    assert(got.map(_._2) == Seq(
      "1970-01-01T00:02:00Z", "1970-01-01T00:02:00Z", "1970-01-01T00:02:30Z",
      "1970-01-01T00:02:30Z", "1970-01-01T00:02:30Z", "1970-01-01T00:03:00Z"))
    assert(got.map(_._3) == Seq(2L, 2L, 3L, 3L, 3L, 1L),
      "batch_size() counts per window")
  }

  test("system_window sliding: messages belong to size/slide windows") {
    val df = Pipeline.build(spark,
      """input:
        |  generate: { count: 2, mapping: 'root.id = this.seq
        |root.at = 65 + this.seq * 100' }
        |buffer:
        |  system_window:
        |    timestamp_mapping: 'root = this.at'
        |    size: 60s
        |    slide: 30s
        |""".stripMargin)
    val got = df.select(
        get_json_object($"value", "$.id").cast("long"),
        $"metadata"("window_end_timestamp"))
      .as[(Long, String)].collect().toSeq.sorted
    // id 0 at t=65 → windows ending 90 and 120; id 1 at t=165 → 180, 210
    assert(got == Seq(
      (0L, "1970-01-01T00:01:30Z"), (0L, "1970-01-01T00:02:00Z"),
      (1L, "1970-01-01T00:03:00Z"), (1L, "1970-01-01T00:03:30Z")))
  }

  test("the adoc traffic-light shape: window + group_by_value + from_all") {
    // counting passengers per traffic light per 1h window
    val df = Pipeline.build(spark,
      """input:
        |  generate:
        |    count: 8
        |    mapping: 'root.light = "L" + (this.seq % 2).string()
        |root.passengers = this.seq
        |root.created_at = 1000 + (this.seq % 4) * 1800'
        |buffer:
        |  system_window:
        |    timestamp_mapping: 'root = this.created_at'
        |    size: 1h
        |pipeline:
        |  processors:
        |    - group_by_value:
        |        value: '${! json("light") }'
        |    - mapping: 'root.light = this.light
        |root.total = json("passengers").from_all().sum()
        |root.w = meta("window_end_timestamp")'
        |""".stripMargin)
    val got = df.select(
        get_json_object($"value", "$.light"),
        get_json_object($"value", "$.w"),
        get_json_object($"value", "$.total").cast("long"))
      .as[(String, String, Long)].collect().toSeq.distinct.sorted
    // window 1: created_at 1000,2800 (seq%4 in 0,1) → ends 01:00:00
    // window 2: created_at 4600,6400 (seq%4 in 2,3) → ends 02:00:00
    // L0 gets seq 0,4 (w1: at 1000) and 2,6 (w2); L1 gets 1,5 (w1), 3,7 (w2)
    assert(got == Seq(
      ("L0", "1970-01-01T01:00:00Z", 4L), ("L0", "1970-01-01T02:00:00Z", 8L),
      ("L1", "1970-01-01T01:00:00Z", 6L), ("L1", "1970-01-01T02:00:00Z", 10L)))
  }
}
