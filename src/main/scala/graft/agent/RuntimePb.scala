package graft.agent

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Hand-rolled protobuf serde for the agent-runtime RPC surface —
  * `redpanda.runtime.v1alpha1` `Message`/`Value` and the
  * `AgentRuntime.InvokeAgent` request/response pair (contract only:
  * reference proto/redpanda/runtime/v1alpha1/{message,agent}.proto).
  *
  * Values map to Jackson JSON nodes: null/string/int64/double/bool
  * round-trip natively; `timestamp_value` decodes to an ISO-8601
  * string; `bytes_value` decodes to base64 text (proto3-JSON's own
  * convention). Encoding from JSON emits the JSON-native kinds only.
  */
object RuntimePb {

  private val mapper = new ObjectMapper()

  /** The runtime's message envelope: raw payload XOR structured value,
    * plus string metadata and the error channel — the same shape as the
    * pipeline envelope (value/metadata/error).
    */
  final case class Msg(payload: Array[Byte],
                       structured: Option[JsonNode],
                       metadata: Map[String, String],
                       error: Option[String])

  // ── low-level writers ──────────────────────────────────────────────

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field.toLong << 3) | wire)
  private def lenField(out: ByteArrayOutputStream, field: Int,
                       bytes: Array[Byte]): Unit = {
    tag(out, field, 2); varint(out, bytes.length.toLong); out.write(bytes)
  }
  private def strField(out: ByteArrayOutputStream, field: Int,
                       s: String): Unit =
    if (s.nonEmpty) lenField(out, field, s.getBytes(UTF_8))

  // ── low-level reader ───────────────────────────────────────────────

  /** Minimal cursor over one protobuf message body. */
  final class Rd(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def bytes(): Array[Byte] = {
      val n = varint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n; out
    }
    def sub(): Rd = {
      val n = varint().toInt
      val r = new Rd(buf, pos, pos + n)
      pos += n; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => pos += varint().toInt
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }

  // ── Value ──────────────────────────────────────────────────────────

  def encodeValue(v: JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (v == null || v.isNull) { tag(out, 1, 0); varint(out, 0L) }
    // a oneof member is PRESENT even at its default, so the empty
    // string must still emit its field — otherwise "" decodes as null
    // (and a guest's metadata round-trip corrupts "" to "null")
    else if (v.isTextual) lenField(out, 2, v.asText.getBytes(UTF_8))
    else if (v.isIntegralNumber) { tag(out, 3, 0); varint(out, v.asLong) }
    else if (v.isFloatingPointNumber) {
      tag(out, 4, 1)
      val bits = java.lang.Double.doubleToLongBits(v.asDouble)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    else if (v.isBoolean) { tag(out, 5, 0); varint(out, if (v.asBoolean) 1 else 0) }
    else if (v.isObject) lenField(out, 8, encodeStruct(v.asInstanceOf[ObjectNode]))
    else if (v.isArray) {
      val inner = new ByteArrayOutputStream()
      v.elements().forEachRemaining(e => lenField(inner, 1, encodeValue(e)))
      lenField(out, 9, inner.toByteArray)
    }
    else if (v.isBinary)
      lenField(out, 7, v.binaryValue())
    else throw new IllegalArgumentException(s"unencodable value: $v")
    out.toByteArray
  }

  def encodeStruct(o: ObjectNode): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    o.properties().forEach { e =>
      val entry = new ByteArrayOutputStream()
      strField(entry, 1, e.getKey)
      lenField(entry, 2, encodeValue(e.getValue))
      lenField(out, 1, entry.toByteArray)
    }
    out.toByteArray
  }

  def decodeValue(r: Rd): JsonNode = {
    var node: JsonNode = mapper.nullNode()
    while (r.hasMore) {
      val t = r.varint()
      val (field, wire) = ((t >>> 3).toInt, (t & 7).toInt)
      field match {
        case 1 => r.varint(); node = mapper.nullNode()
        case 2 => node = mapper.getNodeFactory.textNode(new String(r.bytes(), UTF_8))
        case 3 => node = mapper.getNodeFactory.numberNode(r.varint())
        case 4 => node = mapper.getNodeFactory.numberNode(
          java.lang.Double.longBitsToDouble(r.fixed64()))
        case 5 => node = mapper.getNodeFactory.booleanNode(r.varint() != 0)
        case 6 =>
          val ts = r.sub()
          var secs = 0L; var nanos = 0L
          while (ts.hasMore) {
            val tt = ts.varint()
            ((tt >>> 3).toInt: @unchecked) match {
              case 1 => secs = ts.varint()
              case 2 => nanos = ts.varint()
            }
          }
          node = mapper.getNodeFactory.textNode(
            java.time.Instant.ofEpochSecond(secs, nanos).toString)
        case 7 => node = mapper.getNodeFactory.textNode(
          java.util.Base64.getEncoder.encodeToString(r.bytes()))
        case 8 => node = decodeStruct(r.sub())
        case 9 =>
          val arr = mapper.createArrayNode()
          val lv = r.sub()
          while (lv.hasMore) {
            val lt = lv.varint()
            if ((lt & 7) == 2 && (lt >>> 3) == 1) arr.add(decodeValue(lv.sub()))
            else lv.skip((lt & 7).toInt)
          }
          node = arr
        case _ => r.skip(wire)
      }
    }
    node
  }

  def decodeStruct(r: Rd): ObjectNode = {
    val o = mapper.createObjectNode()
    while (r.hasMore) {
      val t = r.varint()
      if ((t >>> 3) == 1 && (t & 7) == 2) {
        val e = r.sub()
        var key = ""
        var value: JsonNode = mapper.nullNode()
        while (e.hasMore) {
          val et = e.varint()
          ((et >>> 3).toInt: @unchecked) match {
            case 1 => key = new String(e.bytes(), UTF_8)
            case 2 => value = decodeValue(e.sub())
          }
        }
        o.set(key, value); ()
      } else r.skip((t & 7).toInt)
    }
    o
  }

  // ── Message ────────────────────────────────────────────────────────

  def encodeMessage(m: Msg): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    m.structured match {
      case Some(v) => lenField(out, 2, encodeValue(v))
      case None => if (m.payload != null) lenField(out, 1, m.payload)
    }
    if (m.metadata.nonEmpty) {
      val o = mapper.createObjectNode()
      m.metadata.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v); () }
      lenField(out, 3, encodeStruct(o))
    }
    m.error.filter(_.nonEmpty).foreach { e =>
      val err = new ByteArrayOutputStream()
      strField(err, 1, e)
      lenField(out, 4, err.toByteArray)
    }
    out.toByteArray
  }

  def decodeMessage(r: Rd): Msg = {
    var payload: Array[Byte] = Array.emptyByteArray
    var structured: Option[JsonNode] = None
    var metadata = Map.empty[String, String]
    var error: Option[String] = None
    while (r.hasMore) {
      val t = r.varint()
      ((t >>> 3).toInt: @unchecked) match {
        case 1 => payload = r.bytes()
        case 2 => structured = Some(decodeValue(r.sub()))
        case 3 =>
          val o = decodeStruct(r.sub())
          val b = Map.newBuilder[String, String]
          // tolerate kind-less Values from older encoders: metadata is
          // a string map, so absence decodes as "" (never "null")
          o.properties().forEach(e => b += e.getKey ->
            (if (e.getValue.isNull) "" else e.getValue.asText))
          metadata = b.result()
        case 4 =>
          val e = r.sub()
          while (e.hasMore) {
            val et = e.varint()
            if ((et >>> 3) == 1 && (et & 7) == 2)
              error = Some(new String(e.bytes(), UTF_8)).filter(_.nonEmpty)
            else e.skip((et & 7).toInt)
          }
        case _ => r.skip((t & 7).toInt)
      }
    }
    Msg(payload, structured, metadata, error)
  }

  // ── InvokeAgent request/response ───────────────────────────────────

  def encodeInvokeRequest(m: Msg, traceId: String = "",
                          spanId: String = ""): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    lenField(out, 1, encodeMessage(m))
    if (traceId.nonEmpty || spanId.nonEmpty) {
      val tc = new ByteArrayOutputStream()
      strField(tc, 1, traceId)
      strField(tc, 2, spanId)
      lenField(out, 2, tc.toByteArray)
    }
    out.toByteArray
  }

  /** Returns the message; the optional Trace payload is skipped (this
    * runtime reports spans through its own tracer exporters).
    */
  def decodeInvokeResponse(buf: Array[Byte]): Msg = {
    val r = new Rd(buf)
    var msg = Msg(Array.emptyByteArray, None, Map.empty, None)
    while (r.hasMore) {
      val t = r.varint()
      if ((t >>> 3) == 1 && (t & 7) == 2) msg = decodeMessage(r.sub())
      else r.skip((t & 7).toInt)
    }
    msg
  }

  def decodeInvokeRequest(buf: Array[Byte]): Msg = {
    val r = new Rd(buf)
    var msg = Msg(Array.emptyByteArray, None, Map.empty, None)
    while (r.hasMore) {
      val t = r.varint()
      if ((t >>> 3) == 1 && (t & 7) == 2) msg = decodeMessage(r.sub())
      else r.skip((t & 7).toInt)
    }
    msg
  }

  def encodeInvokeResponse(m: Msg): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    lenField(out, 1, encodeMessage(m))
    out.toByteArray
  }
}
