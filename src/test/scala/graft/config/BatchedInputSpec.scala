package graft.config

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BatchOps

/** `batched` input policies (inputs/batched.adoc:110-133): count /
  * byte_size / period / check batch formation, and the resulting
  * `__batch` identity driving batch_index()/batch_size().
  */
class BatchedInputSpec extends SparkSpec {
  import spark.implicits._

  private def run(yaml: String): Seq[(Long, Long, Long)] =
    Pipeline.build(spark, yaml)
      .select(
        get_json_object($"value", "$.id").cast("long"),
        get_json_object($"value", "$.bi").cast("long"),
        get_json_object($"value", "$.bs").cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  private val indexMapping =
    """    - mapping: |
      |        root.id = this.id
      |        root.bi = batch_index()
      |        root.bs = batch_size()
      |""".stripMargin

  test("count policy: batches of 4,4,2 with correct batch_index/size") {
    val out = run(
      s"""input:
         |  batched:
         |    child:
         |      generate: { count: 10, mapping: 'root.id = this.seq' }
         |    policy: { count: 4 }
         |pipeline:
         |  processors:
         |$indexMapping""".stripMargin)
    assert(out.map(_._2) == Seq(0L, 1, 2, 3, 0, 1, 2, 3, 0, 1),
      s"batch_index wrong: $out")
    assert(out.map(_._3) == Seq(4L, 4, 4, 4, 4, 4, 4, 4, 2, 2),
      s"batch_size wrong: $out")
  }

  test("byte_size policy flushes once accumulated bytes reach the bound") {
    // each message is {"id":N} = 8 bytes; byte_size 20 → flush on the
    // 3rd message (24 >= 20): batches of 3,3,3,1
    val out = run(
      s"""input:
         |  batched:
         |    child:
         |      generate: { count: 10, mapping: 'root.id = this.seq' }
         |    policy: { byte_size: 20 }
         |pipeline:
         |  processors:
         |$indexMapping""".stripMargin)
    assert(out.map(_._3) == Seq(3L, 3, 3, 3, 3, 3, 3, 3, 3, 1),
      s"batch_size wrong: $out")
  }

  test("check predicate ENDS the batch on the matching message") {
    val out = run(
      s"""input:
         |  batched:
         |    child:
         |      generate: { count: 10, mapping: 'root.id = this.seq' }
         |    policy: { check: 'this.id % 4 == 3' }
         |pipeline:
         |  processors:
         |$indexMapping""".stripMargin)
    // ids 3 and 7 close their batches: [0..3] [4..7] [8,9]
    assert(out.map(_._3) == Seq(4L, 4, 4, 4, 4, 4, 4, 4, 2, 2),
      s"batch_size wrong: $out")
    assert(out(3)._2 == 3 && out(4)._2 == 0,
      "batch must break AFTER the matching message")
  }

  test("period policy opens a new batch when event time advances past it") {
    val df = Seq(
      (0L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, "b", java.sql.Timestamp.valueOf("2024-01-01 00:00:00.4")),
      (2L, "c", java.sql.Timestamp.valueOf("2024-01-01 00:00:01.5")),
      (3L, "d", java.sql.Timestamp.valueOf("2024-01-01 00:00:01.7")),
      (4L, "e", java.sql.Timestamp.valueOf("2024-01-01 00:00:09.0")))
      .toDF("__seq", "value", "ts").repartition(1)
    val out = BatchOps.formBatches(df, "__seq", periodMs = 1000,
        tsCol = Some("ts"))
      .orderBy("__seq").select("__batch").as[Long].collect().toSeq
    // 0,0 (within 1s of batch open) | 1,1 (1.5s..) | 2
    assert(out(0) == out(1) && out(1) != out(2) &&
      out(2) == out(3) && out(3) != out(4), s"period batches wrong: $out")
  }

  test("archive folds PER formed batch, not the whole stream") {
    val yaml =
      """input:
        |  batched:
        |    child:
        |      generate: { count: 6, mapping: 'root.id = this.seq' }
        |    policy: { count: 2 }
        |pipeline:
        |  processors:
        |    - archive: { format: json_array }
        |""".stripMargin
    import spark.implicits._
    val out = Pipeline.build(spark, yaml)
      .select($"value").as[String].collect().toSeq
    assert(out.length == 3, s"expected one message per 2-row batch: $out")
    assert(out.forall(v =>
      v.startsWith("[") && v.count(_ == '{') == 2), s"ragged fold: $out")
  }

  test("select_parts indexes within EACH formed batch, not the stream") {
    val yaml =
      """input:
        |  batched:
        |    child:
        |      generate: { count: 9, mapping: 'root.id = this.seq' }
        |    policy: { count: 3 }
        |pipeline:
        |  processors:
        |    - select_parts: { parts: [0] }
        |""".stripMargin
    import spark.implicits._
    val out = Pipeline.build(spark, yaml)
      .select(get_json_object($"value", "$.id").cast("long"))
      .as[Long].collect().sorted.toSeq
    // part 0 of each 3-row batch — NOT just the stream's first row
    assert(out == Seq(0L, 3L, 6L), s"per-batch part selection wrong: $out")
  }

  test("split rebatches: downstream archive folds per sub-batch") {
    val yaml =
      """input:
        |  batched:
        |    child:
        |      generate: { count: 8, mapping: 'root.id = this.seq' }
        |    policy: { count: 4 }
        |pipeline:
        |  processors:
        |    - split: { size: 2 }
        |    - archive: { format: json_array }
        |""".stripMargin
    import spark.implicits._
    val out = Pipeline.build(spark, yaml)
      .select($"value").as[String].collect().toSeq
    assert(out.length == 4, s"expected 4 sub-batch folds: $out")
    assert(out.forall(_.count(_ == '{') == 2), s"ragged sub-batch: $out")
  }

  test("insert_part inserts once per formed batch") {
    val yaml =
      """input:
        |  batched:
        |    child:
        |      generate: { count: 4, mapping: 'root.id = this.seq' }
        |    policy: { count: 2 }
        |pipeline:
        |  processors:
        |    - insert_part: { index: 0, content: HDR }
        |""".stripMargin
    import spark.implicits._
    val out = Pipeline.build(spark, yaml).select($"__seq", $"value")
      .as[(Long, String)].collect().toSeq
    val got = out.map(_._2)
    assert(got.count(_ == "HDR") == 2, s"one header per batch: $got")
    // __seq must stay STREAM-unique after the per-batch insert — a
    // per-batch ordinal would collide across batches and break
    // downstream ordering/dedupe determinism
    val seqs = out.map(_._1)
    assert(seqs.distinct.length == seqs.length,
      s"__seq collided across batches: $out")
    // order survives: each header precedes its batch's rows
    val ordered = out.sortBy(_._1).map(_._2)
    assert(ordered.grouped(3).forall(g => g.head == "HDR"),
      s"headers must sort to the front of their batch: $ordered")
  }

  test("batch ids are partition-unique without a global sort") {
    val df = spark.range(100)
      .select($"id".as("__seq"), lit("x").as("value")).repartition(4)
    val batches = BatchOps.formBatches(df, "__seq", count = 7)
      .select("__batch").distinct().as[Long].collect()
    assert(batches.length >= 4 * 3,
      "each partition must form its own batch sequence")
    assert(batches.distinct.length == batches.length)
  }
}
