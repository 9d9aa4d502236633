package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.commons.compress.compressors.CompressorStreamFactory
import org.apache.spark.unsafe.types.UTF8String

/** Codec kernels behind the graft_* codec expressions
  * (SURVEY.md §2.10): compression (reference `compress`/`decompress`
  * processors, docs/modules/components/pages/processors/compress.adoc:26 —
  * algorithms flate/gzip/lz4/snappy/zlib/bzip2), Avro binary ↔ JSON
  * (internal/impl/avro/scanner.go:65), and YAML → JSON
  * (bloblang `parse_yaml`, methods.adoc parsing section).
  *
  * All dependencies (commons-compress, avro, jackson-yaml + the zstd/
  * snappy/lz4 native codecs commons-compress discovers) ship with Spark.
  */
object CodecOps {

  private val factory = new CompressorStreamFactory()

  /** Reference algorithm name → commons-compress stream name. */
  private def ccName(algo: String): String = algo match {
    case "gzip" | "pgzip" => CompressorStreamFactory.GZIP
    case "zlib" | "flate" | "deflate" => CompressorStreamFactory.DEFLATE
    case "bzip2" => CompressorStreamFactory.BZIP2
    case "lz4" => CompressorStreamFactory.LZ4_FRAMED
    case "snappy" => CompressorStreamFactory.SNAPPY_FRAMED
    case "zstd" => CompressorStreamFactory.ZSTANDARD
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  def compress(data: Array[Byte], algo: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = factory.createCompressorOutputStream(ccName(algo), bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  def decompress(data: Array[Byte], algo: String): Array[Byte] = {
    val in = factory.createCompressorInputStream(ccName(algo),
      new ByteArrayInputStream(data))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  // ── Avro (schema-driven JSON ↔ binary datum) ──────────────────────────

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  private def schemaOf(json: String): Schema =
    schemaCache.computeIfAbsent(json, s => new Schema.Parser().parse(s))

  /** JSON text → Avro binary datum (single record, no container file —
    * the wire shape schema-registry payloads use after the 5-byte
    * header).
    */
  def avroEncode(json: UTF8String, schemaJson: String): Array[Byte] = {
    val schema = schemaOf(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val record = reader.read(null,
      DecoderFactory.get().jsonDecoder(schema, json.toString))
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(record, enc)
    enc.flush()
    bos.toByteArray
  }

  /** Avro binary datum → JSON text. */
  def avroDecode(data: Array[Byte], schemaJson: String): UTF8String = {
    val schema = schemaOf(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val record = reader.read(null,
      DecoderFactory.get().binaryDecoder(data, null))
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().jsonEncoder(schema, bos)
    new GenericDatumWriter[GenericRecord](schema).write(record, enc)
    enc.flush()
    UTF8String.fromBytes(bos.toByteArray)
  }

  /** Schema-registry wire format (internal/impl/confluent — magic byte 0
    * + big-endian 4-byte schema id + avro datum).
    */
  def wireEncode(json: UTF8String, schemaJson: String, schemaId: Int): Array[Byte] = {
    val datum = avroEncode(json, schemaJson)
    val out = java.nio.ByteBuffer.allocate(5 + datum.length)
    out.put(0.toByte).putInt(schemaId).put(datum)
    out.array()
  }

  def wireDecode(data: Array[Byte], schemaJson: String): UTF8String = {
    require(data.length >= 5 && data(0) == 0,
      "not schema-registry wire format (magic byte != 0)")
    avroDecode(java.util.Arrays.copyOfRange(data, 5, data.length), schemaJson)
  }

  def wireSchemaId(data: Array[Byte]): Int = {
    require(data.length >= 5 && data(0) == 0,
      "not schema-registry wire format (magic byte != 0)")
    java.nio.ByteBuffer.wrap(data, 1, 4).getInt
  }

  // ── YAML → JSON ───────────────────────────────────────────────────────

  private val yamlMapper =
    new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def yamlToJson(yaml: UTF8String): UTF8String =
    UTF8String.fromString(
      jsonMapper.writeValueAsString(yamlMapper.readTree(yaml.toString)))
}
