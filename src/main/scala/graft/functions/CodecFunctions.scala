package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.GraftFunctions

/** Column API over the codec expressions (SURVEY.md §2.10): compression,
  * Avro, schema-registry wire format, YAML, logfmt.
  */
object CodecFunctions {

  def register(spark: SparkSession): Unit = GraftFunctions.register(spark)

  /** compress (processors/compress.adoc:26); algo ∈ gzip/zlib/flate/
    * bzip2/lz4/snappy/zstd.
    */
  def compress(data: Column, algo: String): Column =
    call_function("graft_compress", data.cast("binary"), lit(algo))

  def decompress(data: Column, algo: String): Column =
    call_function("graft_decompress", data, lit(algo))

  /** Avro single-datum encode/decode with an inline schema (JSON text ↔
    * binary; internal/impl/avro/scanner.go:65).
    */
  def avroEncode(json: Column, schemaJson: String): Column =
    call_function("graft_avro_encode", json, lit(schemaJson))

  def avroDecode(data: Column, schemaJson: String): Column =
    call_function("graft_avro_decode", data, lit(schemaJson))

  /** Confluent wire format: magic 0 + schema id + datum
    * (internal/impl/confluent, schema_registry_encode.adoc:26).
    */
  def wireEncode(json: Column, schemaJson: String, schemaId: Int): Column =
    call_function("graft_wire_encode", json, lit(schemaJson), lit(schemaId))

  def wireDecode(data: Column, schemaJson: String): Column =
    call_function("graft_wire_decode", data, lit(schemaJson))

  /** Wire-header schema id as a column (pure byte math — codegen'd).
    * Signed like the kernel's ByteBuffer.getInt: a plain cast("int")
    * would NULL out ids with the high bit set (non-ANSI overflow),
    * silently skipping both decode and error in the provider guard.
    */
  def wireSchemaId(data: Column): Column = {
    val u = conv(hex(substring(data, 2, 4)), 16, 10).cast("long")
    when(u > Int.MaxValue, u - 4294967296L).otherwise(u).cast("int")
  }

  /** Provider-resolved decode: schema looked up from the header id via
    * a [[graft.functions.expressions.SchemaProvider]] (the reference's
    * registry-client path, internal/impl/confluent/).
    */
  def wireDecodeProvider(data: Column,
      provider: graft.functions.expressions.SchemaProvider,
      lenient: Boolean = false): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.WireDecodeProvider(
        org.apache.spark.sql.GraftColumnBridge.expression(data), provider,
        lenient))

  /** Subject-resolved encode: subject → latest (id, schema) via the
    * provider (schema_registry_encode.adoc subject field).
    */
  def wireEncodeSubject(json: Column, subject: String,
      provider: graft.functions.expressions.SchemaProvider): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.expressions.WireEncodeSubject(
        org.apache.spark.sql.GraftColumnBridge.expression(json),
        subject, provider))

  /** protobuf wire format (processors/protobuf.adoc:26) — hand-rolled
    * proto3 subset codec; schema DSL
    * `"<num>:<name>:<type>[*],…"` (see CodecOps.protoEncode).
    */
  def protoEncode(json: Column, schema: String): Column =
    call_function("graft_proto_encode", json, lit(schema))

  def protoDecode(data: Column, schema: String): Column =
    call_function("graft_proto_decode", data, lit(schema))

  /** msgpack encode/decode (processors/msgpack.adoc:26) — hand-rolled
    * canonical subset codec (CodecOps), JSON text ⇄ bytes.
    */
  def msgpackEncode(json: Column): Column =
    call_function("graft_msgpack_encode", json)

  def msgpackDecode(data: Column): Column =
    call_function("graft_msgpack_decode", data)

  /** json_schema validation (processors/json_schema.adoc:26): null when
    * valid, else the first violation message.
    */
  def jsonSchemaCheck(json: Column, schemaJson: String): Column =
    call_function("graft_json_schema_check", json, lit(schemaJson))

  /** parse_yaml (methods.adoc parsing section) → JSON text. */
  def parseYaml(yaml: Column): Column =
    call_function("graft_parse_yaml", yaml)

  /** parse_logfmt (space-separated k=v pairs; quoted values NOT handled
    * in v1) → map<string,string>.
    */
  def parseLogfmt(line: Column): Column =
    str_to_map(line, lit(" "), lit("="))

  /** parse_log (processors/parse_log.adoc:26), syslog formats → struct.
    * Pure regexp_extract composition: codegen'd, no UDF, and the regex
    * dialect is restricted to the Java∩RE2 common subset so a DuckDB
    * oracle can apply the identical patterns. facility/severity decode
    * the <PRI> header (pri = facility*8 + severity).
    *
    * "rfc5424": `<PRI>1 TS HOST APP PROC MSGID [SD]|- MSG`
    * "rfc3164": `<PRI>MMM dd HH:mm:ss HOST TAG[PID]: MSG`
    */
  def parseSyslog(line: Column, format: String): Column = {
    val pri = regexp_extract(line, "^<(\\d{1,3})>", 1).cast("int")
    val fac = floor(pri / 8).cast("int").as("facility")
    val sev = pmod(pri, lit(8)).cast("int").as("severity")
    format match {
      case "rfc5424" =>
        val re = "^<\\d{1,3}>\\d+ (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) " +
          "(?:\\[[^\\]]*\\]|-) ?(.*)$"
        struct(fac, sev,
          regexp_extract(line, re, 1).as("ts"),
          regexp_extract(line, re, 2).as("host"),
          regexp_extract(line, re, 3).as("app"),
          regexp_extract(line, re, 4).as("procid"),
          regexp_extract(line, re, 5).as("msgid"),
          regexp_extract(line, re, 6).as("message"))
      case "rfc3164" =>
        val re = "^<\\d{1,3}>([A-Z][a-z]{2} [ 0-9]\\d \\d{2}:\\d{2}:\\d{2}) " +
          "(\\S+) ([^:\\[ ]+)(?:\\[(\\d+)\\])?: (.*)$"
        struct(fac, sev,
          regexp_extract(line, re, 1).as("ts"),
          regexp_extract(line, re, 2).as("host"),
          regexp_extract(line, re, 3).as("app"),
          regexp_extract(line, re, 4).as("procid"),
          regexp_extract(line, re, 5).as("message"))
      case other =>
        throw new IllegalArgumentException(s"parse_log format: $other")
    }
  }
}
