package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `command`/`subprocess` process-pipe operators (reference
  * processors/command.adoc:26, subprocess.adoc:26) and the parquet BLOB
  * codec (processor_decode.go:76) — plus the batch-order guarantees of
  * archive (processors/archive.adoc:26).
  */
class CommandParquetSpec extends SparkSpec {
  import spark.implicits._

  test("command forks per message; stdout replaces value") {
    val in = Seq((1L, "hello"), (2L, "area")).toDF("id", "value")
    val out = Command.perMessage(in, Seq("tr", "ae", "AE"))
      .orderBy("id").select("value").as[String].collect()
    assert(out.toSeq == Seq("hEllo", "ArEA"))
  }

  test("command non-zero exit feeds the error channel with stderr") {
    val in = Seq((1L, "x")).toDF("id", "value")
    val out = Command.perMessage(in,
        Seq("sh", "-c", "echo boom >&2; exit 3"))
      .select("error").as[String].collect()
    assert(out.head.contains("exited 3"))
    assert(out.head.contains("boom"))
  }

  test("command survives a child that floods stderr (pipe-buffer hang)") {
    // 256 KB of stderr noise — far past the ~64 KB pipe buffer; without
    // a drain thread waitFor() deadlocks here
    val in = Seq((1L, "ok")).toDF("id", "value")
    val out = Command.perMessage(in,
        Seq("sh", "-c",
          "head -c 262144 /dev/zero | tr '\\0' 'x' >&2; cat"))
      .select("value", "error").as[(String, String)].collect()
    assert(out.head == (("ok", null)))
  }

  test("subprocess runs one child per partition over the line protocol") {
    val in = (1 to 50).map(i => (i.toLong, s"line$i")).toDF("id", "value")
      .repartition(3)
    val out = Command.perPartition(in, Seq("sed", "-u", "s/line/row/"))
      .orderBy("id").select("value").as[String].collect()
    assert(out.toSeq == (1 to 50).map(i => s"row$i"))
  }

  test("subprocess child is reaped when the partition is cut short") {
    val in = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "value")
      .coalesce(1)
    // LIMIT leaves the iterator unexhausted; the task-completion hook
    // must still kill the child (this test hangs/leaks without it)
    val out = Command.perPartition(in, Seq("sed", "-u", "s/v/V/"))
      .limit(3).select("value").as[String].collect()
    assert(out.length == 3)
  }

  test("parquet blob round-trips rows through encode/decode") {
    val schema = "message t { required int64 id; required binary s (UTF8); }"
    val in = Seq((1L, "alpha"), (2L, "beta"), (3L, "γάμμα")).toDF("id", "s")
    val json = in.agg(to_json(collect_list(struct($"id", $"s"))).as("j"))
    val back = json
      .withColumn("blob", call_function("graft_parquet_encode", $"j", lit(schema)))
      .withColumn("rows", from_json(
        call_function("graft_parquet_decode", $"blob"),
        lit("array<struct<id:bigint,s:string>>")))
      .select(explode($"rows").as("r"))
      .select($"r.id", $"r.s").orderBy("id")
      .as[(Long, String)].collect()
    assert(back.toSeq == Seq((1L, "alpha"), (2L, "beta"), (3L, "γάμμα")))
  }

  test("archive concatenates in BATCH order, not content order") {
    val in = Seq((0L, 0L, "b"), (1L, 0L, "a"), (2L, 0L, "c"))
      .toDF("seq", "k", "v")
    val lines = BatchOps.archiveLines(in, $"k", $"v", $"seq")
      .select($"archived").as[String].collect().head
    assert(lines == "b\na\nc")
    val arr = BatchOps.archiveJsonArray(in, $"k",
        to_json(struct($"v")), $"seq")
      .select($"archived").as[String].collect().head
    assert(arr == """[{"v":"b"},{"v":"a"},{"v":"c"}]""")
  }
}
