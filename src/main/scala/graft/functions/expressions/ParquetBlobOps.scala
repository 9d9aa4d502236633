package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.{ColumnIOFactory, DelegatingPositionOutputStream,
  DelegatingSeekableInputStream, InputFile, OutputFile, PositionOutputStream,
  SeekableInputStream}
import org.apache.parquet.schema.{MessageType, MessageTypeParser,
  PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet BLOB codec — the reference's `parquet_decode`/`parquet_encode`
  * processors and the `parse_parquet` Bloblang method operate on a whole
  * parquet FILE carried as one message payload
  * (reference internal/impl/parquet/processor_decode.go:76,
  * processor_encode.go:92; methods.adoc parse_parquet). Spark's native
  * reader handles parquet *tables*; this kernel handles parquet *values* —
  * e.g. a Kafka message that contains a small parquet file.
  *
  * Built on parquet-java's public example/Group API (ships with Spark).
  * Entirely executor-side and allocation-local: a blob decodes within the
  * task that holds it, so the operator is a narrow map — no shuffle, no
  * driver involvement, scales with partitions.
  */
object ParquetBlobOps {

  private val mapper = new ObjectMapper()

  /** ByteArrayInputStream with its cursor exposed — parquet reads are
    * footer-first, so the stream must be seekable.
    */
  private class SeekableBais(bytes: Array[Byte]) extends ByteArrayInputStream(bytes) {
    def position: Long = pos.toLong
    def seekTo(p: Long): Unit = { pos = p.toInt }
  }

  private class BytesInputFile(bytes: Array[Byte]) extends InputFile {
    override def getLength: Long = bytes.length.toLong
    override def newStream(): SeekableInputStream = {
      val bais = new SeekableBais(bytes)
      new DelegatingSeekableInputStream(bais) {
        override def getPos: Long = bais.position
        override def seek(newPos: Long): Unit = bais.seekTo(newPos)
      }
    }
  }

  /** In-memory OutputFile over a growing byte buffer. */
  private class BytesOutputFile extends OutputFile {
    val bos = new ByteArrayOutputStream()
    private def stream(): PositionOutputStream =
      new DelegatingPositionOutputStream(bos) {
        override def getPos: Long = bos.size.toLong
      }
    override def create(blockSizeHint: Long): PositionOutputStream = stream()
    override def createOrOverwrite(blockSizeHint: Long): PositionOutputStream = stream()
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
  }

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, MessageType]()

  private def schemaOf(s: String): MessageType =
    schemaCache.computeIfAbsent(s, MessageTypeParser.parseMessageType(_))

  /** Parquet file bytes → JSON array of row documents (flat schemas:
    * primitive columns; missing/null fields are omitted, matching the
    * reference's JSON view of optional fields).
    */
  def decode(bytes: Array[Byte]): UTF8String = {
    val reader = ParquetFileReader.open(new BytesInputFile(bytes))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val out = mapper.createArrayNode()
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val columnIO = new ColumnIOFactory().getColumnIO(schema)
        val rr = columnIO.getRecordReader(pages, new GroupRecordConverter(schema))
        var i = 0L
        while (i < pages.getRowCount) {
          out.add(groupToJson(rr.read(), schema))
          i += 1
        }
        pages = reader.readNextRowGroup()
      }
      UTF8String.fromString(mapper.writeValueAsString(out))
    } finally reader.close()
  }

  private def groupToJson(g: Group, schema: MessageType): JsonNode = {
    val node = mapper.createObjectNode()
    schema.getFields.asScala.zipWithIndex.foreach { case (f, idx) =>
      if (g.getFieldRepetitionCount(idx) > 0) {
        val name = f.getName
        f.asPrimitiveType().getPrimitiveTypeName match {
          case INT32 => node.put(name, g.getInteger(idx, 0))
          case INT64 => node.put(name, g.getLong(idx, 0))
          case FLOAT => node.put(name, g.getFloat(idx, 0))
          case DOUBLE => node.put(name, g.getDouble(idx, 0))
          case BOOLEAN => node.put(name, g.getBoolean(idx, 0))
          case BINARY | FIXED_LEN_BYTE_ARRAY =>
            node.put(name, g.getBinary(idx, 0).toStringUsingUTF8)
          case INT96 =>
            node.put(name, g.getInt96(idx, 0).toStringUsingUTF8)
        }
      }
    }
    node
  }

  /** JSON array of row documents + parquet message-schema text → parquet
    * file bytes (uncompressed: blob payloads are small and the caller can
    * layer `compress` — the reference exposes codec choice the same way).
    */
  def encode(json: UTF8String, schemaText: String): Array[Byte] = {
    val schema = schemaOf(schemaText)
    val outFile = new BytesOutputFile()
    val writer: ParquetWriter[Group] = ExampleParquetWriter.builder(outFile)
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.UNCOMPRESSED)
      .build()
    try {
      val arr = mapper.readTree(json.toString)
      require(arr.isArray, "parquet encode expects a JSON array of rows")
      val it = arr.elements()
      while (it.hasNext) {
        val row = it.next()
        val g = new SimpleGroup(schema)
        schema.getFields.asScala.foreach { f =>
          val v = row.get(f.getName)
          if (v != null && !v.isNull) addField(g, f, v)
        }
        writer.write(g)
      }
    } finally writer.close()
    outFile.bos.toByteArray
  }

  private def addField(g: Group, f: Type, v: JsonNode): Unit = {
    val name = f.getName
    f.asPrimitiveType().getPrimitiveTypeName match {
      case INT32 => g.append(name, v.asInt)
      case INT64 => g.append(name, v.asLong)
      case FLOAT => g.append(name, v.asDouble.toFloat)
      case DOUBLE => g.append(name, v.asDouble)
      case BOOLEAN => g.append(name, v.asBoolean)
      case BINARY | FIXED_LEN_BYTE_ARRAY => g.append(name, v.asText)
      case other => throw new IllegalArgumentException(
        s"parquet encode: unsupported type $other for field $name")
    }
  }
}
