package graft.sources

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** OTLP/HTTP telemetry ingest (reference `internal/impl/otlp` —
  * input_http.go, otlpconv/{trace,log,metric}.go): an OpenTelemetry
  * collector receiver exposing `/v1/traces`, `/v1/logs`,
  * `/v1/metrics`, accepting both `application/json` and
  * `application/x-protobuf` export requests, then UNBATCHING each
  * request into one self-contained message per span / log record /
  * metric with the parent Resource and InstrumentationScope embedded
  * (otlpconv/trace.go TracesToRedpandaFunc) and metadata
  * `otel_signal_type` + `otel_encoding` (input_http.go Output Format).
  *
  * The wire side is built from PUBLIC formats only: the proto3
  * encoding spec (the same hand-rolled approach as the flat codec in
  * CodecOps.scala — no protobuf-java in this environment) driven by
  * descriptors of the public opentelemetry-proto v1 schema, and the
  * OTLP/JSON mapping (camelCase field names, 64-bit integers as
  * decimal strings, trace/span ids as HEX, other bytes base64, enums
  * as integers, proto3 defaults omitted). Both encodings normalize to
  * the SAME canonical JSON, so protobuf and JSON requests of the same
  * payload unbatch to byte-identical messages — that parity is what
  * OtlpSpec pins.
  *
  * Scale shape: the server is a push ingress (N replicas behind a
  * balancer in a real deployment, same note as HttpPushServer); the
  * UNBATCH is the distributed half — request bodies are rows, the
  * per-request decode+flatten runs executor-side with no shuffle, and
  * fan-out parallelism tracks the request count, not the span count.
  */
object Otlp {

  private val mapper = new ObjectMapper()

  // ── descriptor model of the public opentelemetry-proto v1 schema ──

  sealed private[sources] trait PType
  private case object TString extends PType
  private case object TBytes extends PType  // base64 in JSON
  private case object THex extends PType    // bytes rendered as hex (ids)
  private case object TI64 extends PType    // varint → decimal string
  private case object TU32 extends PType    // varint → JSON number
  private case object TEnum extends PType   // varint → JSON number
  private case object TBool extends PType
  private case object TF64 extends PType    // fixed64 → decimal string
  private case object TSF64 extends PType   // sfixed64 → decimal string
  private case object TDouble extends PType // fixed64 → JSON number
  private case object TFix32 extends PType  // fixed32 → JSON number
  final private case class TMsg(fields: Map[Int, FieldD]) extends PType
  /** `oneof = true` marks proto3 oneof MEMBERS: a set oneof member is
    * always serialized (and protojson always emits it) even at the
    * type's default value — 0/false/"" presence is meaningful there,
    * unlike plain singular fields where proto3 default-omission
    * applies.
    */
  final private case class FieldD(name: String, tpe: PType,
                                  repeated: Boolean = false,
                                  oneof: Boolean = false)

  // common.v1 — every AnyValue field is a member of the `value` oneof
  private lazy val AnyValueD: TMsg = TMsg(Map(
    1 -> FieldD("stringValue", TString, oneof = true),
    2 -> FieldD("boolValue", TBool, oneof = true),
    3 -> FieldD("intValue", TI64, oneof = true),
    4 -> FieldD("doubleValue", TDouble, oneof = true),
    5 -> FieldD("arrayValue", TMsg(Map(
      1 -> FieldD("values", AnyValueRef, repeated = true))), oneof = true),
    6 -> FieldD("kvlistValue", TMsg(Map(
      1 -> FieldD("values", KeyValueRef, repeated = true))), oneof = true),
    7 -> FieldD("bytesValue", TBytes, oneof = true)))
  // proto recursion (AnyValue contains arrays of itself) needs a lazy
  // indirection; resolve through a sentinel replaced at lookup time
  private case object AnyValueRef extends PType
  private case object KeyValueRef extends PType
  private lazy val KeyValueD: TMsg = TMsg(Map(
    1 -> FieldD("key", TString), 2 -> FieldD("value", AnyValueRef)))
  private def resolve(t: PType): PType = t match {
    case AnyValueRef => AnyValueD
    case KeyValueRef => KeyValueD
    case other => other
  }

  private val ScopeD: TMsg = TMsg(Map(
    1 -> FieldD("name", TString), 2 -> FieldD("version", TString),
    3 -> FieldD("attributes", KeyValueRef, repeated = true),
    4 -> FieldD("droppedAttributesCount", TU32)))

  private val ResourceD: TMsg = TMsg(Map(
    1 -> FieldD("attributes", KeyValueRef, repeated = true),
    2 -> FieldD("droppedAttributesCount", TU32)))

  // trace.v1
  private val SpanEventD: TMsg = TMsg(Map(
    1 -> FieldD("timeUnixNano", TF64), 2 -> FieldD("name", TString),
    3 -> FieldD("attributes", KeyValueRef, repeated = true),
    4 -> FieldD("droppedAttributesCount", TU32)))
  private val SpanLinkD: TMsg = TMsg(Map(
    1 -> FieldD("traceId", THex), 2 -> FieldD("spanId", THex),
    3 -> FieldD("traceState", TString),
    4 -> FieldD("attributes", KeyValueRef, repeated = true),
    5 -> FieldD("droppedAttributesCount", TU32),
    6 -> FieldD("flags", TFix32)))
  private val StatusD: TMsg = TMsg(Map(
    2 -> FieldD("message", TString), 3 -> FieldD("code", TEnum)))
  private val SpanD: TMsg = TMsg(Map(
    1 -> FieldD("traceId", THex), 2 -> FieldD("spanId", THex),
    3 -> FieldD("traceState", TString),
    4 -> FieldD("parentSpanId", THex), 5 -> FieldD("name", TString),
    6 -> FieldD("kind", TEnum),
    7 -> FieldD("startTimeUnixNano", TF64),
    8 -> FieldD("endTimeUnixNano", TF64),
    9 -> FieldD("attributes", KeyValueRef, repeated = true),
    10 -> FieldD("droppedAttributesCount", TU32),
    11 -> FieldD("events", SpanEventD, repeated = true),
    12 -> FieldD("droppedEventsCount", TU32),
    13 -> FieldD("links", SpanLinkD, repeated = true),
    14 -> FieldD("droppedLinksCount", TU32),
    15 -> FieldD("status", StatusD), 16 -> FieldD("flags", TFix32)))
  private val TracesRequestD: TMsg = TMsg(Map(
    1 -> FieldD("resourceSpans", TMsg(Map(
      1 -> FieldD("resource", ResourceD),
      2 -> FieldD("scopeSpans", TMsg(Map(
        1 -> FieldD("scope", ScopeD),
        2 -> FieldD("spans", SpanD, repeated = true),
        3 -> FieldD("schemaUrl", TString))), repeated = true),
      3 -> FieldD("schemaUrl", TString))), repeated = true)))

  // logs.v1
  private val LogRecordD: TMsg = TMsg(Map(
    1 -> FieldD("timeUnixNano", TF64),
    11 -> FieldD("observedTimeUnixNano", TF64),
    2 -> FieldD("severityNumber", TEnum),
    3 -> FieldD("severityText", TString),
    5 -> FieldD("body", AnyValueRef),
    6 -> FieldD("attributes", KeyValueRef, repeated = true),
    7 -> FieldD("droppedAttributesCount", TU32),
    8 -> FieldD("flags", TFix32), 9 -> FieldD("traceId", THex),
    10 -> FieldD("spanId", THex), 12 -> FieldD("eventName", TString)))
  private val LogsRequestD: TMsg = TMsg(Map(
    1 -> FieldD("resourceLogs", TMsg(Map(
      1 -> FieldD("resource", ResourceD),
      2 -> FieldD("scopeLogs", TMsg(Map(
        1 -> FieldD("scope", ScopeD),
        2 -> FieldD("logRecords", LogRecordD, repeated = true),
        3 -> FieldD("schemaUrl", TString))), repeated = true),
      3 -> FieldD("schemaUrl", TString))), repeated = true)))

  // metrics.v1
  private val NumberPointD: TMsg = TMsg(Map(
    7 -> FieldD("attributes", KeyValueRef, repeated = true),
    2 -> FieldD("startTimeUnixNano", TF64),
    3 -> FieldD("timeUnixNano", TF64),
    4 -> FieldD("asDouble", TDouble, oneof = true),
    6 -> FieldD("asInt", TSF64, oneof = true),
    8 -> FieldD("flags", TU32)))
  private val HistogramPointD: TMsg = TMsg(Map(
    9 -> FieldD("attributes", KeyValueRef, repeated = true),
    2 -> FieldD("startTimeUnixNano", TF64),
    3 -> FieldD("timeUnixNano", TF64),
    4 -> FieldD("count", TF64), 5 -> FieldD("sum", TDouble),
    6 -> FieldD("bucketCounts", TF64, repeated = true),
    7 -> FieldD("explicitBounds", TDouble, repeated = true),
    10 -> FieldD("flags", TU32),
    11 -> FieldD("min", TDouble), 12 -> FieldD("max", TDouble)))
  private val SummaryPointD: TMsg = TMsg(Map(
    7 -> FieldD("attributes", KeyValueRef, repeated = true),
    2 -> FieldD("startTimeUnixNano", TF64),
    3 -> FieldD("timeUnixNano", TF64),
    4 -> FieldD("count", TF64), 5 -> FieldD("sum", TDouble),
    6 -> FieldD("quantileValues", TMsg(Map(
      1 -> FieldD("quantile", TDouble), 2 -> FieldD("value", TDouble))),
      repeated = true),
    8 -> FieldD("flags", TU32)))
  private val MetricD: TMsg = TMsg(Map(
    1 -> FieldD("name", TString), 2 -> FieldD("description", TString),
    3 -> FieldD("unit", TString),
    5 -> FieldD("gauge", TMsg(Map(
      1 -> FieldD("dataPoints", NumberPointD, repeated = true)))),
    7 -> FieldD("sum", TMsg(Map(
      1 -> FieldD("dataPoints", NumberPointD, repeated = true),
      2 -> FieldD("aggregationTemporality", TEnum),
      3 -> FieldD("isMonotonic", TBool)))),
    9 -> FieldD("histogram", TMsg(Map(
      1 -> FieldD("dataPoints", HistogramPointD, repeated = true),
      2 -> FieldD("aggregationTemporality", TEnum)))),
    11 -> FieldD("summary", TMsg(Map(
      1 -> FieldD("dataPoints", SummaryPointD, repeated = true)))),
    12 -> FieldD("metadata", KeyValueRef, repeated = true)))
  private val MetricsRequestD: TMsg = TMsg(Map(
    1 -> FieldD("resourceMetrics", TMsg(Map(
      1 -> FieldD("resource", ResourceD),
      2 -> FieldD("scopeMetrics", TMsg(Map(
        1 -> FieldD("scope", ScopeD),
        2 -> FieldD("metrics", MetricD, repeated = true),
        3 -> FieldD("schemaUrl", TString))), repeated = true),
      3 -> FieldD("schemaUrl", TString))), repeated = true)))

  private def requestDesc(signal: String): TMsg = signal match {
    case "trace" => TracesRequestD
    case "log" => LogsRequestD
    case "metric" => MetricsRequestD
    case other => throw new IllegalArgumentException(s"signal: $other")
  }

  // ───────────── proto3 wire → canonical JSON (decode) ─────────────

  private def readVarint(buf: java.nio.ByteBuffer): Long = {
    var v = 0L; var shift = 0; var b = 0
    do { b = buf.get() & 0xff; v |= (b & 0x7fL) << shift; shift += 7 }
    while ((b & 0x80) != 0)
    v
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray

  /** Decode one message per the descriptor; unknown fields skipped
    * (proto3 forward compat), absent fields omitted (canonical OTLP
    * JSON omits proto3 defaults). Packed AND unpacked repeated
    * scalars both accepted — exporters emit packed.
    */
  /** Re-emit keys in descriptor field-number order so the canonical
    * form is byte-identical regardless of input key/wire order.
    */
  private def ordered(node: ObjectNode, desc: TMsg): ObjectNode = {
    val out = mapper.createObjectNode()
    desc.fields.toSeq.sortBy(_._1).foreach { case (_, f) =>
      val v = node.get(f.name)
      if (v != null) { out.set[JsonNode](f.name, v); () }
    }
    out
  }

  private def decodeMsg(buf: java.nio.ByteBuffer, desc: TMsg): ObjectNode = {
    val out = mapper.createObjectNode()
    def arr(name: String): ArrayNode = out.get(name) match {
      case a: ArrayNode => a
      case _ => val a = out.putArray(name); a
    }
    def scalarNode(tpe: PType, buf: java.nio.ByteBuffer): JsonNode = tpe match {
      case TI64 => mapper.getNodeFactory.textNode(readVarint(buf).toString)
      case TU32 | TEnum => mapper.getNodeFactory.numberNode(readVarint(buf))
      case TBool => mapper.getNodeFactory.booleanNode(readVarint(buf) != 0)
      case TF64 =>
        mapper.getNodeFactory.textNode(
          java.lang.Long.toUnsignedString(
            buf.order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong))
      case TSF64 =>
        mapper.getNodeFactory.textNode(
          buf.order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toString)
      case TDouble =>
        mapper.getNodeFactory.numberNode(
          buf.order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble)
      case TFix32 =>
        mapper.getNodeFactory.numberNode(
          buf.order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL)
      case other => throw new IllegalStateException(s"not scalar: $other")
    }
    while (buf.hasRemaining) {
      val tag = readVarint(buf)
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      desc.fields.get(num) match {
        case None => // skip unknown
          wire match {
            case 0 => readVarint(buf); ()
            case 1 => buf.position(buf.position() + 8); ()
            case 2 =>
              val len = readVarint(buf).toInt
              buf.position(buf.position() + len); ()
            case 5 => buf.position(buf.position() + 4); ()
            case other =>
              throw new IllegalArgumentException(s"otlp: wire type $other")
          }
        case Some(f) =>
          resolve(f.tpe) match {
            case m: TMsg =>
              val len = readVarint(buf).toInt
              val slice = buf.slice(buf.position(), len)
              buf.position(buf.position() + len)
              val node = decodeMsg(slice, m)
              if (f.repeated) { arr(f.name).add(node); () }
              else { out.set[JsonNode](f.name, node); () }
            case TString =>
              val len = readVarint(buf).toInt
              val b = new Array[Byte](len); buf.get(b)
              val s = new String(b, StandardCharsets.UTF_8)
              if (f.repeated) { arr(f.name).add(s); () } else { out.put(f.name, s); () }
            case TBytes | THex =>
              val len = readVarint(buf).toInt
              val b = new Array[Byte](len); buf.get(b)
              val s = if (resolve(f.tpe) == THex) hex(b)
                else java.util.Base64.getEncoder.encodeToString(b)
              if (f.repeated) { arr(f.name).add(s); () } else { out.put(f.name, s); () }
            case scalar =>
              if (f.repeated && wire == 2) { // packed
                val len = readVarint(buf).toInt
                val slice = buf.slice(buf.position(), len)
                buf.position(buf.position() + len)
                val a = arr(f.name)
                while (slice.hasRemaining) { a.add(scalarNode(scalar, slice)); () }
              } else if (f.repeated) { arr(f.name).add(scalarNode(scalar, buf)); () }
              else { out.set[JsonNode](f.name, scalarNode(scalar, buf)); () }
          }
      }
    }
    ordered(out, desc)
  }

  // ───────────── canonical JSON → proto3 wire (encode) ─────────────

  private def writeVarint(bos: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
  }

  private def writeFixed64(bos: ByteArrayOutputStream, bits: Long): Unit =
    (0 until 8).foreach(i => bos.write(((bits >>> (8 * i)) & 0xff).toInt))

  /** `force` = write even at the type's default value. Proto3
    * default-omission applies ONLY to plain singular fields: every
    * element of a repeated field and every set oneof member is
    * serialized unconditionally (a bucketCounts of ["0","4","0"]
    * keeps its zeros; a gauge of 0.0 stays distinguishable from a
    * value-less point).
    */
  private def encodeMsg(node: JsonNode, desc: TMsg): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def one(num: Int, tpe: PType, v: JsonNode, force: Boolean): Unit =
      resolve(tpe) match {
      case m: TMsg =>
        val b = encodeMsg(v, m)
        writeVarint(bos, (num.toLong << 3) | 2); writeVarint(bos, b.length)
        bos.write(b)
      case TString =>
        val b = v.asText.getBytes(StandardCharsets.UTF_8)
        if (force || b.nonEmpty) {
          writeVarint(bos, (num.toLong << 3) | 2); writeVarint(bos, b.length)
          bos.write(b)
        }
      case TBytes =>
        val b = java.util.Base64.getDecoder.decode(v.asText)
        if (force || b.nonEmpty) {
          writeVarint(bos, (num.toLong << 3) | 2); writeVarint(bos, b.length)
          bos.write(b)
        }
      case THex =>
        val b = unhex(v.asText)
        if (force || b.nonEmpty) {
          writeVarint(bos, (num.toLong << 3) | 2); writeVarint(bos, b.length)
          bos.write(b)
        }
      case TI64 =>
        val x = v.asLong
        if (force || x != 0) {
          writeVarint(bos, (num.toLong << 3) | 0); writeVarint(bos, x)
        }
      case TU32 | TEnum =>
        val x = v.asLong
        if (force || x != 0) {
          writeVarint(bos, (num.toLong << 3) | 0); writeVarint(bos, x)
        }
      case TBool =>
        if (force || v.asBoolean) {
          writeVarint(bos, (num.toLong << 3) | 0)
          bos.write(if (v.asBoolean) 1 else 0)
        }
      case TF64 =>
        val x = java.lang.Long.parseUnsignedLong(v.asText)
        if (force || x != 0) {
          writeVarint(bos, (num.toLong << 3) | 1); writeFixed64(bos, x)
        }
      case TSF64 =>
        val x = v.asLong
        if (force || x != 0) {
          writeVarint(bos, (num.toLong << 3) | 1); writeFixed64(bos, x)
        }
      case TDouble =>
        val x = v.asDouble
        if (force || x != 0.0) {
          writeVarint(bos, (num.toLong << 3) | 1)
          writeFixed64(bos, java.lang.Double.doubleToLongBits(x))
        }
      case TFix32 =>
        val x = v.asLong
        if (force || x != 0) {
          writeVarint(bos, (num.toLong << 3) | 5)
          (0 until 4).foreach(i => bos.write(((x >>> (8 * i)) & 0xff).toInt))
        }
      case AnyValueRef | KeyValueRef =>
        throw new IllegalStateException("unresolved ref")
    }
    desc.fields.toSeq.sortBy(_._1).foreach { case (num, f) =>
      val v = node.get(f.name)
      if (v != null && !v.isNull) {
        if (f.repeated) v.forEach(one(num, f.tpe, _, force = true))
        else one(num, f.tpe, v, force = f.oneof)
      }
    }
    bos.toByteArray
  }

  // ───────── OTLP/JSON input → canonical form (normalize) ─────────

  private def snakeToCamel(s: String): String = {
    val parts = s.split("_")
    parts.head + parts.tail.map(_.capitalize).mkString
  }

  /** Accept both camelCase and snake_case keys (protojson accepts
    * both; the OTLP spec's emission form is camelCase) and both
    * number and string forms for 64-bit integers; emit the canonical
    * shape with proto3 defaults dropped.
    */
  private def normalize(node: JsonNode, desc: TMsg): ObjectNode = {
    val byName = desc.fields.map { case (_, f) => f.name -> f }
    val out = mapper.createObjectNode()
    // keep = element of a repeated field OR a set oneof member: the
    // proto3 default-omission rule never applies there, so the
    // canonical node is produced unconditionally.
    def canonScalar(tpe: PType, v: JsonNode,
                    keep: Boolean): Option[JsonNode] = tpe match {
      case TI64 | TF64 | TSF64 =>
        val s0 = v.asText
        val s = if (s0.isEmpty) "0" else s0
        if (!keep && s == "0") None
        else Some(mapper.getNodeFactory.textNode(s))
      case TU32 | TEnum | TFix32 =>
        if (!keep && v.asLong == 0) None
        else Some(mapper.getNodeFactory.numberNode(v.asLong))
      case TBool =>
        if (!keep && !v.asBoolean) None
        else Some(mapper.getNodeFactory.booleanNode(v.asBoolean))
      case TDouble =>
        if (!keep && v.asDouble == 0.0) None
        else Some(mapper.getNodeFactory.numberNode(v.asDouble))
      case TString | TBytes | THex =>
        if (!keep && v.asText.isEmpty) None
        else Some(mapper.getNodeFactory.textNode(
          if (tpe == THex) v.asText.toLowerCase else v.asText))
      case other => throw new IllegalStateException(s"not scalar: $other")
    }
    node.properties().asScala.foreach { e =>
      val name = if (e.getKey.contains("_")) snakeToCamel(e.getKey) else e.getKey
      byName.get(name).foreach { f =>
        val v = e.getValue
        resolve(f.tpe) match {
          case m: TMsg =>
            if (f.repeated) {
              if (v.size() > 0) {
                val a = out.putArray(f.name)
                v.forEach(x => { a.add(normalize(x, m)); () })
              }
            } else { out.set[JsonNode](f.name, normalize(v, m)); () }
          case scalar =>
            if (f.repeated) {
              if (v.size() > 0) {
                val a = out.putArray(f.name)
                v.forEach { x =>
                  canonScalar(scalar, x, keep = true).foreach { n =>
                    a.add(n); ()
                  }
                }
              }
            } else canonScalar(scalar, v, keep = f.oneof).foreach { n =>
              out.set[JsonNode](f.name, n); ()
            }
        }
      }
    }
    ordered(out, desc)
  }

  /** Parse an export-request body (either encoding) to canonical JSON. */
  def parseRequest(signal: String, encoding: String,
                   body: Array[Byte]): ObjectNode = encoding match {
    case "protobuf" =>
      decodeMsg(java.nio.ByteBuffer.wrap(body), requestDesc(signal))
    case "json" =>
      normalize(mapper.readTree(new String(body, StandardCharsets.UTF_8)),
        requestDesc(signal))
    case other => throw new IllegalArgumentException(s"encoding: $other")
  }

  /** Canonical request JSON → protobuf wire bytes (the output half /
    * fixture builder).
    */
  def encodeRequest(signal: String, canonicalJson: String): Array[Byte] =
    encodeMsg(mapper.readTree(canonicalJson), requestDesc(signal))

  // ─────────────────────────── unbatch ───────────────────────────

  /** One export request → self-contained per-item messages with
    * Resource/Scope embedded (the redpanda otel v1 shape:
    * otlpconv/trace.go spanToRedpanda — resource, resourceSchemaUrl,
    * scope, scopeSchemaUrl alongside the item's own fields).
    */
  def unbatch(signal: String, req: ObjectNode): Seq[String] = {
    val (listA, listB, listC) = signal match {
      case "trace" => ("resourceSpans", "scopeSpans", "spans")
      case "log" => ("resourceLogs", "scopeLogs", "logRecords")
      case "metric" => ("resourceMetrics", "scopeMetrics", "metrics")
      case other => throw new IllegalArgumentException(s"signal: $other")
    }
    val out = ArrayBuffer.empty[String]
    Option(req.get(listA)).foreach(_.forEach { rs =>
      val resource = rs.get("resource")
      val resourceUrl = rs.get("schemaUrl")
      Option(rs.get(listB)).foreach(_.forEach { ss =>
        val scope = ss.get("scope")
        val scopeUrl = ss.get("schemaUrl")
        Option(ss.get(listC)).foreach(_.forEach { item =>
          val msg = mapper.createObjectNode()
          if (resource != null) msg.set[JsonNode]("resource", resource)
          if (resourceUrl != null)
            msg.set[JsonNode]("resourceSchemaUrl", resourceUrl)
          if (scope != null) msg.set[JsonNode]("scope", scope)
          if (scopeUrl != null) msg.set[JsonNode]("scopeSchemaUrl", scopeUrl)
          item.properties().asScala.foreach(e =>
            msg.set[JsonNode](e.getKey, e.getValue))
          out += mapper.writeValueAsString(msg)
        })
      })
    })
    out.toSeq
  }

  /** Distributed unbatch: rows of raw export requests
    * (`signal, encoding, body`) → the message envelope, one row per
    * span / log record / metric, with the input_http.go metadata
    * surface. Decode + flatten run executor-side; no shuffle.
    */
  def unbatchDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sIdx = df.schema.fieldIndex("signal")
    val eIdx = df.schema.fieldIndex("encoding")
    val bIdx = df.schema.fieldIndex("body")
    val qIdx =
      if (df.schema.fieldNames.contains("__seq"))
        Some(df.schema.fieldIndex("__seq"))
      else None
    val rows = df.rdd.flatMap { r =>
      val signal = r.getString(sIdx)
      val encoding = r.getString(eIdx)
      val body = r.getAs[Array[Byte]](bIdx)
      // the envelope contract is __seq = emission order; fold the
      // request's own sequence into the high bits so items from
      // different requests never collide (same discriminator scheme
      // as the partitioned broker sources)
      val reqSeq = qIdx.map(r.getLong).getOrElse(0L)
      val req = parseRequest(signal, encoding, body)
      unbatch(signal, req).zipWithIndex.map { case (json, i) =>
        Row(json, Map(
          "otel_signal_type" -> signal,
          "otel_encoding" -> encoding), null, (reqSeq << 32) | i.toLong)
      }
    }
    spark.createDataFrame(rows, BrokerStream.schema)
  }

  // ───────────────────────── rebatch (output) ─────────────────────────

  /** The output half's inverse of [[unbatch]] (otlpconv/trace.go
    * TracesFromRedpanda): self-contained per-item messages →  one
    * export request, re-grouping by Resource and Scope with
    * SEQUENTIAL change detection — consecutive items sharing a
    * resource/scope collapse into one ResourceSpans/ScopeSpans entry
    * (unbatch emits them consecutively, so the round trip rebuilds
    * the original batch structure).
    */
  def rebatch(signal: String, messages: Seq[String]): ObjectNode = {
    val (listA, listB, listC) = signal match {
      case "trace" => ("resourceSpans", "scopeSpans", "spans")
      case "log" => ("resourceLogs", "scopeLogs", "logRecords")
      case "metric" => ("resourceMetrics", "scopeMetrics", "metrics")
      case other => throw new IllegalArgumentException(s"signal: $other")
    }
    val req = mapper.createObjectNode()
    val resArr = req.putArray(listA)
    var curResKey: String = null
    var curScopeKey: String = null
    var curScopeArr: ArrayNode = null
    var curItemArr: ArrayNode = null
    messages.foreach { s =>
      val m = mapper.readTree(s)
      // canonical form is deterministic → JSON text equality IS the
      // resource/scope hash (conv.go ResourceHash/ScopeHash analog)
      val resKey = String.valueOf(m.get("resource")) + " " +
        String.valueOf(m.get("resourceSchemaUrl"))
      val scopeKey = String.valueOf(m.get("scope")) + " " +
        String.valueOf(m.get("scopeSchemaUrl"))
      if (resKey != curResKey) {
        val rs = resArr.addObject()
        if (m.hasNonNull("resource"))
          rs.set[JsonNode]("resource", m.get("resource"))
        curScopeArr = rs.putArray(listB)
        if (m.hasNonNull("resourceSchemaUrl"))
          rs.set[JsonNode]("schemaUrl", m.get("resourceSchemaUrl"))
        curResKey = resKey
        curScopeKey = null
      }
      if (scopeKey != curScopeKey) {
        val ss = curScopeArr.addObject()
        if (m.hasNonNull("scope")) ss.set[JsonNode]("scope", m.get("scope"))
        curItemArr = ss.putArray(listC)
        if (m.hasNonNull("scopeSchemaUrl"))
          ss.set[JsonNode]("schemaUrl", m.get("scopeSchemaUrl"))
        curScopeKey = scopeKey
      }
      val item = mapper.createObjectNode()
      m.properties().asScala.foreach { e =>
        if (e.getKey != "resource" && e.getKey != "resourceSchemaUrl" &&
            e.getKey != "scope" && e.getKey != "scopeSchemaUrl")
          item.set[JsonNode](e.getKey, e.getValue)
      }
      curItemArr.add(item)
      ()
    }
    req
  }

  /** otlp_http OUTPUT (output_http.go: per-batch export POST to
    * `<endpoint>/v1/<signal>`, content_type json|protobuf, bearer
    * auth): envelope rows carrying unbatched messages (+
    * otel_signal_type metadata) are re-grouped and exported
    * EXECUTOR-SIDE, one request per partition-local run of
    * `batchSize` — the narrow no-shuffle write every other sink uses.
    */
  def export(df: DataFrame, endpoint: String, contentType: String = "protobuf",
             authToken: Option[String] = None, batchSize: Int = 512,
             client: graft.operators.Http.Client = null): Unit = {
    import graft.operators.Http
    require(Set("json", "protobuf")(contentType),
      s"otlp: content_type '$contentType'")
    val base = endpoint.stripSuffix("/")
    val vIdx = df.schema.fieldIndex(Envelope.ValueCol)
    val mIdx = df.schema.fieldIndex(Envelope.MetadataCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      val c = Option(client).getOrElse(Http.javaClient())
      it.grouped(batchSize).foreach { rows =>
        rows.groupBy(r =>
          r.getMap[String, String](mIdx)
            .getOrElse("otel_signal_type", "trace"))
          .foreach { case (signal, group) =>
            val req = rebatch(signal, group.map(_.getString(vIdx)))
            val path = signal match {
              case "trace" => "/v1/traces"
              case "log" => "/v1/logs"
              case "metric" => "/v1/metrics"
              case other =>
                throw new IllegalArgumentException(s"signal: $other")
            }
            val hdrs = Map("Content-Type" ->
              (if (contentType == "protobuf") "application/x-protobuf"
               else "application/json")) ++
              authToken.map(t => "Authorization" -> s"Bearer $t")
            val request =
              if (contentType == "protobuf")
                Http.Request(base + path, "POST", hdrs, "",
                  bodyBytes = encodeMsg(req, requestDesc(signal)))
              else Http.Request(base + path, "POST", hdrs,
                mapper.writeValueAsString(req))
            val resp = c(Seq(request)).head
            if (resp.status < 200 || resp.status > 299)
              throw new IllegalStateException(
                s"otlp export: ${resp.status}: ${resp.body.take(200)}")
          }
      }
    }
  }

  // ──────────────────────── HTTP receiver ────────────────────────

  /** Loopback OTLP/HTTP receiver (input_http.go Endpoints): real
    * sockets on an ephemeral port, `/v1/traces` `/v1/logs`
    * `/v1/metrics`, JSON + protobuf by Content-Type, optional bearer
    * auth_token (401 without), 400 on an undecodable body, success
    * responses in the request's encoding (`{}` / empty proto).
    */
  final class HttpServer(authToken: Option[String] = None) {
    private val received =
      ArrayBuffer.empty[(String, String, Array[Byte])] // signal, enc, body

    private val server = JdkHttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    Seq("traces" -> "trace", "logs" -> "log", "metrics" -> "metric")
      .foreach { case (path, signal) =>
        server.createContext(s"/v1/$path",
          (ex: HttpExchange) => handle(ex, signal))
      }
    // daemon workers: a leaked server must never pin the JVM open (a
    // non-daemon pool held runMain-forked drivers alive after main)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val th = new Thread(r, "otlp-http"); th.setDaemon(true); th
      })
    server.setExecutor(pool)
    server.start()

    def port: Int = server.getAddress.getPort
    def url(signal: String): String = signal match {
      case "trace" => s"http://127.0.0.1:$port/v1/traces"
      case "log" => s"http://127.0.0.1:$port/v1/logs"
      case "metric" => s"http://127.0.0.1:$port/v1/metrics"
      case other => throw new IllegalArgumentException(other)
    }

    private def handle(ex: HttpExchange, signal: String): Unit = {
      try {
        val body = ex.getRequestBody.readAllBytes()
        val ct = Option(ex.getRequestHeaders.getFirst("Content-type"))
          .getOrElse("application/json")
        val encoding =
          if (ct.startsWith("application/x-protobuf")) "protobuf" else "json"
        val authOk = authToken.forall { tok =>
          Option(ex.getRequestHeaders.getFirst("Authorization"))
            .contains(s"Bearer $tok")
        }
        if (!authOk) { respond(ex, encoding, 401, "unauthorized") }
        else {
          val ok =
            try { parseRequest(signal, encoding, body); true }
            catch { case _: Exception => false }
          if (!ok) respond(ex, encoding, 400, "bad request")
          else {
            received.synchronized { received += ((signal, encoding, body)); () }
            respond(ex, encoding, 200, "")
          }
        }
      } finally ex.close()
    }

    private def respond(ex: HttpExchange, encoding: String, status: Int,
                        err: String): Unit = {
      val resp =
        if (encoding == "protobuf") Array.empty[Byte]
        else if (status == 200) "{}".getBytes(StandardCharsets.UTF_8)
        else s"""{"message":"$err"}""".getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        if (encoding == "protobuf") "application/x-protobuf"
        else "application/json")
      ex.sendResponseHeaders(status, if (resp.isEmpty) -1 else resp.length)
      if (resp.nonEmpty) ex.getResponseBody.write(resp)
    }

    /** Snapshot every accepted export request as rows
      * (`signal, encoding, body, __seq`) — feed to [[unbatchDf]].
      */
    def drain(spark: SparkSession): DataFrame = {
      import org.apache.spark.sql.types._
      val snapshot = received.synchronized(received.toVector)
      val rows = snapshot.zipWithIndex.map { case ((s, e, b), i) =>
        Row(s, e, b, i.toLong)
      }
      val schema = StructType(Seq(
        StructField("signal", StringType), StructField("encoding", StringType),
        StructField("body", BinaryType), StructField("__seq", LongType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows,
          math.max(1, math.min(rows.size,
            spark.sparkContext.defaultParallelism))), schema)
    }

    def receivedCount: Int = received.synchronized(received.size)
    HttpServer.servers.put(s"127.0.0.1:$port", this)
    def stop(): Unit = {
      server.stop(0); pool.shutdown()
      HttpServer.servers.remove(s"127.0.0.1:$port"); ()
    }
  }

  object HttpServer {
    /** Live collectors by `host:port` — the config-form seam: an
      * `otlp_http` input's `address` resolves to the running server,
      * whose accepted exports the bounded run drains.
      */
    private[sources] val servers =
      new java.util.concurrent.ConcurrentHashMap[String, HttpServer]()
    def serverAt(address: String): Option[HttpServer] =
      Option(servers.get(address))
  }
}
