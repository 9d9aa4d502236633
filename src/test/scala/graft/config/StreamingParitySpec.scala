package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch ≡ streaming conformance for the stateful processor families:
  * the SAME compiled processor (the config runner's own
  * `Processors.compile` output) applied to a MemoryStream must produce
  * the same rows as the batch form on identical input — the
  * reference's processors are micro-batch-agnostic by construction
  * (one message in, N messages out), so any divergence here is a bug
  * in our streaming compilation, not a semantic choice.
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._

  private val yaml = new ObjectMapper(new YAMLFactory())

  private def compiled(processorYaml: String): DataFrame => DataFrame =
    Processors.compile(yaml.readTree(processorYaml), Map.empty)

  /** Run `proc` over the rows via MemoryStream (fed in two chunks so
    * cross-micro-batch state is exercised), collect the append-mode
    * sink, return the value column sorted.
    */
  private def streamed(proc: DataFrame => DataFrame,
                       rows: Seq[(Long, String)],
                       name: String): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = proc(mem.toDF().toDF("__seq", "value"))
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).select($"value").as[String].collect().toSeq.sorted
  }

  private def batched(proc: DataFrame => DataFrame,
                      rows: Seq[(Long, String)]): Seq[String] =
    proc(rows.toDF("__seq", "value"))
      .select($"value").as[String].collect().toSeq.sorted

  test("http enrichment: batch and streaming produce identical rows") {
    val proc = compiled(
      """http:
        |  url: stub://svc/ok
        |  verb: POST
        |  batch_size: 4
        |""".stripMargin)
    val rows = (0L until 20L).map(i => i -> s"""{"i":$i}""")
    assert(streamed(proc, rows, "par_http") == batched(proc, rows))
  }

  test("dedupe: first occurrence wins in batch and across micro-batches") {
    val proc = compiled("dedupe: {}\n")
    // duplicates within a micro-batch AND across the chunk boundary
    val rows = Seq(
      1L -> "a", 2L -> "b", 3L -> "a", 4L -> "c",
      5L -> "b", 6L -> "d", 7L -> "a", 8L -> "c")
    assert(streamed(proc, rows, "par_dedupe") == batched(proc, rows))
    assert(streamed(proc, rows, "par_dedupe2") == Seq("a", "b", "c", "d"))
  }

  test("dedupe keeps the lowest-__seq row per key WITHIN one micro-batch") {
    val proc = compiled("dedupe: { key: '${! this.k }' }\n")
    // same key, different payloads, all in ONE chunk: the batch window
    // keeps the lowest __seq deterministically — streaming must too
    val rows = Seq(
      5L -> """{"k":"a","v":"late"}""",
      1L -> """{"k":"a","v":"first"}""",
      3L -> """{"k":"a","v":"mid"}""",
      2L -> """{"k":"b","v":"bfirst"}""",
      4L -> """{"k":"b","v":"blate"}""")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = proc(mem.toDF().toDF("__seq", "value"))
      .writeStream.format("memory").queryName("par_dedupe_seq")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*) // one micro-batch
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("par_dedupe_seq")
      .select($"value").as[String].collect().toSeq.sorted
    assert(out == Seq("""{"k":"a","v":"first"}""", """{"k":"b","v":"bfirst"}"""),
      s"within-batch winner must be the lowest __seq, got $out")
    assert(out == batched(proc, rows), "and identical to the batch form")
  }

  test("cache get: stream-static join matches the batch join") {
    Seq(("a", "A!"), ("b", "B!")).toDF("key", "value")
      .createOrReplaceTempView("cache_par")
    val proc = compiled(
      """cache:
        |  resource: par
        |  operator: get
        |""".stripMargin)
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "miss_me", 4L -> "a")
    assert(streamed(proc, rows, "par_cache") == batched(proc, rows))
    assert(streamed(proc, rows, "par_cache2").count(_ == "A!") == 2)
  }

  test("wasm: the row kernel is micro-batch-agnostic") {
    val f = java.nio.file.Files.createTempFile("graft-wasm-par", ".wasm")
    try {
      java.nio.file.Files.write(f, graft.wasm.DemoModules.upperLen())
      val proc = compiled(
        s"""wasm:
           |  module_path: $f
           |""".stripMargin)
      val rows = (0L until 12L).map(i => i -> s"msg-$i")
      assert(streamed(proc, rows, "par_wasm") == batched(proc, rows))
    } finally java.nio.file.Files.delete(f)
  }

  test("ffi: downcalls run identically per micro-batch") {
    val lib = graft.operators.FfiDemo.ensureLib()
    val proc = compiled(
      s"""ffi:
         |  library_path: $lib
         |  function_name: GraftReverseBytes
         |  args_mapping: 'root = [content(), content(), content().length()]'
         |  signature:
         |    return: { type: int32 }
         |    parameters:
         |      - type: byte*
         |      - { type: byte*, out: true }
         |      - type: int32
         |""".stripMargin)
    val rows = (0L until 10L).map(i => i -> s"val$i")
    assert(streamed(proc, rows, "par_ffi") == batched(proc, rows))
  }
}
