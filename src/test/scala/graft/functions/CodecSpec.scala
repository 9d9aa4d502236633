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

  test("msgpack round-trips nested JSON including edge values") {
    import graft.functions.expressions.CodecOps
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      """{"k":9}""",
      """{"a":[1,2.5,"x",null,true,false],"b":{"nested":{"deep":-42}}}""",
      """{"neg":-32,"big":9007199254740993,"s":""}""",
      """[]""", """{}""", """"just a string"""", """1234""", """null""")
    cases.foreach { j =>
      val rt = CodecOps.msgpackDecode(
        CodecOps.msgpackEncode(UTF8String.fromString(j))).toString
      assert(rt == j, s"round-trip changed: $j -> $rt")
    }
  }

  test("msgpack uses compact encodings") {
    import graft.functions.expressions.CodecOps
    import org.apache.spark.unsafe.types.UTF8String
    assert(CodecOps.msgpackEncode(UTF8String.fromString("5")).toSeq == Seq(5.toByte))
    assert(CodecOps.msgpackEncode(UTF8String.fromString("\"ab\""))
      .toSeq == Seq(0xa2.toByte, 'a'.toByte, 'b'.toByte))
    assert(CodecOps.msgpackEncode(UTF8String.fromString("[1,2]"))
      .toSeq == Seq(0x92.toByte, 1.toByte, 2.toByte))
  }

  test("json_schema reports first violation, null when valid") {
    import graft.functions.expressions.CodecOps
    import org.apache.spark.unsafe.types.UTF8String
    val schema = """{"type":"object","required":["k"],
      "properties":{"k":{"type":"integer","minimum":0},
        "tag":{"type":"string","pattern":"^[a-z]+$"}}}"""
    def check(doc: String): String =
      Option(CodecOps.jsonSchemaCheck(UTF8String.fromString(doc), schema))
        .map(_.toString).orNull
    assert(check("""{"k":3}""") == null)
    assert(check("""{"k":3,"tag":"ok"}""") == null)
    assert(check("""{}""").contains("missing required"))
    assert(check("""{"k":"x"}""").contains("expected integer"))
    assert(check("""{"k":-1}""").contains("below minimum"))
    assert(check("""{"k":1,"tag":"BAD"}""").contains("pattern"))
    assert(check("""not json""") == "invalid JSON")
  }

  test("protobuf wire format matches the spec's canonical example") {
    import graft.functions.expressions.CodecOps
    import org.apache.spark.unsafe.types.UTF8String
    // field 1 = varint 150 encodes as 08 96 01 (the protobuf docs example)
    val bytes = CodecOps.protoEncode(
      UTF8String.fromString("""{"a":150}"""), "1:a:int64")
    assert(bytes.toSeq == Seq(0x08.toByte, 0x96.toByte, 0x01.toByte))
  }

  test("protobuf round-trips all supported types including repeated") {
    import graft.functions.expressions.CodecOps
    import org.apache.spark.unsafe.types.UTF8String
    val schema = "1:id:int64,2:name:string,3:price:double,4:flag:bool,5:tags:string*"
    val doc = """{"id":42,"name":"widget","price":9.75,"flag":true,"tags":["a","b"]}"""
    val rt = CodecOps.protoDecode(
      CodecOps.protoEncode(UTF8String.fromString(doc), schema), schema).toString
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(m.readTree(rt) == m.readTree(doc))
  }

  test("protobuf decode skips unknown fields and fills proto3 defaults") {
    import graft.functions.expressions.CodecOps
    import org.apache.spark.unsafe.types.UTF8String
    // encode with a superset schema, decode with a subset + a new field
    val enc = CodecOps.protoEncode(
      UTF8String.fromString("""{"id":7,"name":"x"}"""),
      "1:id:int64,2:name:string")
    val rt = CodecOps.protoDecode(enc, "1:id:int64,9:missing:string").toString
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.readTree(rt)
    assert(n.get("id").asLong == 7)
    assert(n.get("missing").asText == "", "absent field gets proto3 default")
    assert(!n.has("name"), "unknown field 2 skipped")
  }

  test("parse_log decodes RFC 3164 and RFC 5424 syslog lines") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lines = Seq(
      ("<34>Oct 11 22:14:15 mymachine su[123]: 'su root' failed", "rfc3164"),
      ("<165>1 2003-10-11T22:14:15Z mymachine.example.com evntslog 123 ID47 " +
        "[exampleSDID@32473 iut=\"3\"] BOMAn application event", "rfc5424"))
      .toDF("line", "fmt")
    val r3 = lines.filter($"fmt" === "rfc3164")
      .select(CodecFunctions.parseSyslog($"line", "rfc3164").as("r"))
      .select($"r.facility", $"r.severity", $"r.host", $"r.app", $"r.procid", $"r.message")
      .as[(Int, Int, String, String, String, String)].head()
    assert(r3 == ((4, 2, "mymachine", "su", "123", "'su root' failed")))
    val r5 = lines.filter($"fmt" === "rfc5424")
      .select(CodecFunctions.parseSyslog($"line", "rfc5424").as("r"))
      .select($"r.facility", $"r.severity", $"r.ts", $"r.host", $"r.app", $"r.message")
      .as[(Int, Int, String, String, String, String)].head()
    assert(r5 == ((20, 5, "2003-10-11T22:14:15Z", "mymachine.example.com",
      "evntslog", "BOMAn application event")))
  }
}
