package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Grok

/** Codec round-trips and grok compilation. */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  private val algos = Seq("gzip", "zlib", "bzip2", "lz4", "snappy", "zstd")

  test("compression round-trips for every supported algorithm") {
    CodecFunctions.register(spark)
    val df = Seq("hello codec world " * 20, "", "☃ unicode ☃").toDF("s")
    algos.foreach { algo =>
      val ok = df.select(
        (CodecFunctions.decompress(
          CodecFunctions.compress(col("s"), algo), algo).cast("string") === col("s"))
          .as("ok")).as[Boolean].collect()
      assert(ok.forall(identity), s"roundtrip failed for $algo")
    }
  }

  test("compression actually shrinks repetitive payloads") {
    CodecFunctions.register(spark)
    val df = Seq("abcabcabc" * 200).toDF("s")
    val sizes = df.select(
      length(col("s")).as("raw"),
      length(CodecFunctions.compress(col("s"), "gzip")).as("gz")).collect()(0)
    assert(sizes.getInt(1) < sizes.getInt(0) / 10)
  }

  test("avro datum + wire format round-trip") {
    CodecFunctions.register(spark)
    val schema =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
        .stripMargin.replace("\n", "")
    val df = Seq((1L, "alpha"), (2L, "β-beta")).toDF("id", "name")
    val json = to_json(struct(col("id"), col("name")))
    val rt = df.select(
      get_json_object(CodecFunctions.avroDecode(
        CodecFunctions.avroEncode(json, schema), schema), "$.name").as("n"))
      .as[String].collect().toSeq
    assert(rt == Seq("alpha", "β-beta"))
    val wire = df.select(CodecFunctions.wireEncode(json, schema, 42).as("w"))
    val firstBytes = wire.select(col("w")).as[Array[Byte]].collect()(0)
    assert(firstBytes(0) == 0 && java.nio.ByteBuffer.wrap(firstBytes, 1, 4).getInt == 42)
    val back = wire.select(get_json_object(
      CodecFunctions.wireDecode(col("w"), schema), "$.id").as("i"))
      .as[String].collect().toSeq
    assert(back == Seq("1", "2"))
  }

  test("yaml parses to json") {
    CodecFunctions.register(spark)
    val df = Seq("a: 1\nb:\n  - x\n  - y").toDF("y")
    val out = df.select(CodecFunctions.parseYaml(col("y"))).as[String].collect()(0)
    assert(out == """{"a":1,"b":["x","y"]}""")
  }

  test("grok compiles templates and extracts fields") {
    val (regex, fields) = Grok.compile(
      "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{IP:ip} %{GREEDYDATA:msg}")
    assert(fields == Seq("ts", "lvl", "ip", "msg"))
    val df = Seq("2021-06-01T10:00:00Z ERROR 10.1.2.3 disk on fire").toDF("line")
    val parsed = Grok.parse(df, col("line"),
      "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{IP:ip} %{GREEDYDATA:msg}")
      .select("ts", "lvl", "ip", "msg").collect()(0)
    assert(parsed.toSeq == Seq("2021-06-01T10:00:00Z", "ERROR", "10.1.2.3", "disk on fire"))
    assert(regex.nonEmpty)
  }

  test("logfmt parses k=v lines into a map") {
    val df = Seq("user=u1 level=info n=42").toDF("line")
    val out = df.select(
      element_at(CodecFunctions.parseLogfmt(col("line")), "level").as("lvl"),
      element_at(CodecFunctions.parseLogfmt(col("line")), "n").as("n"))
      .collect()(0)
    assert(out.toSeq == Seq("info", "42"))
  }
}
