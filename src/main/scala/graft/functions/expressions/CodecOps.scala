package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.commons.compress.compressors.CompressorStreamFactory
import org.apache.spark.unsafe.types.UTF8String

import com.fasterxml.jackson.databind.JsonNode

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

  def compress(data: Array[Byte], algo: String): Array[Byte] = algo match {
    // one-shot native paths: the commons-compress stream wrappers
    // allocate a fresh codec context per call (~1 ms for zstd/snappy),
    // which dominates per-row cost; the direct zstd-jni / snappy-java
    // one-shot calls are 10-30× cheaper and ship with Spark
    case "zstd" => com.github.luben.zstd.Zstd.compress(data)
    case "snappy" => org.xerial.snappy.Snappy.compress(data)
    case _ =>
      val bos = new ByteArrayOutputStream()
      val out = factory.createCompressorOutputStream(ccName(algo), bos)
      out.write(data); out.close()
      bos.toByteArray
  }

  def decompress(data: Array[Byte], algo: String): Array[Byte] = algo match {
    case "zstd" =>
      val sz = com.github.luben.zstd.Zstd.getFrameContentSize(data)
      require(sz >= 0 && sz <= Int.MaxValue, "zstd: unknown content size")
      com.github.luben.zstd.Zstd.decompress(data, sz.toInt)
    case "snappy" => org.xerial.snappy.Snappy.uncompress(data)
    case _ =>
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
  //
  // Hot path: one call per row. Avro's JsonDecoder/JsonEncoder compile a
  // parsing grammar per construction (~1.6 ms/row measured at sf0.1), so
  // the JSON side is a direct Jackson-tree ↔ GenericRecord mapping that
  // preserves Avro's JSON-encoding conventions (union branch wrapping,
  // ISO-8859-1 bytes, schema field order), and the binary side reuses
  // per-thread readers/writers/coders keyed by schema. Reference shape:
  // internal/impl/confluent/common_to_avro.go.

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[String, Schema]()

  private def schemaOf(json: String): Schema =
    schemaCache.computeIfAbsent(json, s => new Schema.Parser().parse(s))

  private final class AvroCtx(val schema: Schema) {
    val writer = new GenericDatumWriter[AnyRef](schema)
    val reader = new GenericDatumReader[AnyRef](schema)
    val bos = new ByteArrayOutputStream()
    var encoder: org.apache.avro.io.BinaryEncoder = _
    var decoder: org.apache.avro.io.BinaryDecoder = _
  }

  private val avroCtxs =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, AvroCtx]())

  private def avroCtx(schemaJson: String): AvroCtx = {
    val m = avroCtxs.get()
    var c = m.get(schemaJson)
    if (c == null) { c = new AvroCtx(schemaOf(schemaJson)); m.put(schemaJson, c) }
    c
  }

  /** Union branch label in Avro's JSON encoding: full name for named
    * types, the lowercase type name otherwise.
    */
  private def unionLabel(s: Schema): String = s.getType match {
    case Schema.Type.RECORD | Schema.Type.ENUM | Schema.Type.FIXED => s.getFullName
    case t => t.getName
  }

  private def jsonToAvro(n: JsonNode, s: Schema): AnyRef = s.getType match {
    case Schema.Type.NULL => null
    case Schema.Type.BOOLEAN => java.lang.Boolean.valueOf(n.asBoolean)
    case Schema.Type.INT => java.lang.Integer.valueOf(n.asInt)
    case Schema.Type.LONG => java.lang.Long.valueOf(n.asLong)
    case Schema.Type.FLOAT => java.lang.Float.valueOf(n.floatValue)
    case Schema.Type.DOUBLE => java.lang.Double.valueOf(n.asDouble)
    case Schema.Type.STRING => new org.apache.avro.util.Utf8(n.asText)
    case Schema.Type.BYTES =>
      java.nio.ByteBuffer.wrap(n.asText.getBytes("ISO-8859-1"))
    case Schema.Type.FIXED =>
      new org.apache.avro.generic.GenericData.Fixed(s, n.asText.getBytes("ISO-8859-1"))
    case Schema.Type.ENUM =>
      new org.apache.avro.generic.GenericData.EnumSymbol(s, n.asText)
    case Schema.Type.ARRAY =>
      val out = new java.util.ArrayList[AnyRef](n.size)
      n.forEach(el => { out.add(jsonToAvro(el, s.getElementType)); () })
      out
    case Schema.Type.MAP =>
      val out = new java.util.LinkedHashMap[CharSequence, AnyRef]()
      n.properties().forEach { e =>
        out.put(new org.apache.avro.util.Utf8(e.getKey),
          jsonToAvro(e.getValue, s.getValueType)); ()
      }
      out
    case Schema.Type.RECORD =>
      val rec = new org.apache.avro.generic.GenericData.Record(s)
      s.getFields.forEach { f =>
        val v = n.get(f.name)
        if (v != null) rec.put(f.pos, jsonToAvro(v, f.schema))
        else if (f.hasDefaultValue)
          rec.put(f.pos,
            org.apache.avro.generic.GenericData.get().getDefaultValue(f))
        else if (f.schema.isNullable) rec.put(f.pos, null)
        else throw new IllegalArgumentException(
          s"avro: missing field '${f.name}' with no default")
      }
      rec
    case Schema.Type.UNION =>
      if (n == null || n.isNull) {
        require(s.getTypes.stream().anyMatch(_.getType == Schema.Type.NULL),
          "avro: null for non-nullable union")
        null
      } else if (n.isObject && n.size == 1) {
        // Avro JSON encoding: {"<branch label>": value}
        val key = n.fieldNames().next()
        val it = s.getTypes.iterator()
        var hit: Schema = null
        while (it.hasNext && hit == null) {
          val b = it.next(); if (unionLabel(b) == key) hit = b
        }
        require(hit != null, s"avro: no union branch named '$key'")
        jsonToAvro(n.get(key), hit)
      } else {
        // tolerate unwrapped values: first branch that accepts the node
        val it = s.getTypes.iterator()
        while (it.hasNext) {
          val b = it.next()
          val ok = b.getType match {
            case Schema.Type.STRING | Schema.Type.ENUM => n.isTextual
            case Schema.Type.INT | Schema.Type.LONG => n.isIntegralNumber
            case Schema.Type.FLOAT | Schema.Type.DOUBLE => n.isNumber
            case Schema.Type.BOOLEAN => n.isBoolean
            case Schema.Type.RECORD | Schema.Type.MAP => n.isObject
            case Schema.Type.ARRAY => n.isArray
            case _ => false
          }
          if (ok) return jsonToAvro(n, b)
        }
        throw new IllegalArgumentException(s"avro: no union branch for $n")
      }
  }

  private def avroToJson(v: AnyRef, s: Schema): JsonNode = {
    val f = jsonMapper.getNodeFactory
    s.getType match {
      case Schema.Type.NULL => f.nullNode()
      case Schema.Type.BOOLEAN =>
        f.booleanNode(v.asInstanceOf[java.lang.Boolean].booleanValue)
      case Schema.Type.INT => f.numberNode(v.asInstanceOf[Number].intValue)
      case Schema.Type.LONG => f.numberNode(v.asInstanceOf[Number].longValue)
      case Schema.Type.FLOAT => f.numberNode(v.asInstanceOf[Number].floatValue)
      case Schema.Type.DOUBLE => f.numberNode(v.asInstanceOf[Number].doubleValue)
      case Schema.Type.STRING | Schema.Type.ENUM => f.textNode(v.toString)
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
        val b = new Array[Byte](bb.remaining()); bb.get(b)
        f.textNode(new String(b, "ISO-8859-1"))
      case Schema.Type.FIXED =>
        f.textNode(new String(
          v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes(), "ISO-8859-1"))
      case Schema.Type.ARRAY =>
        val arr = jsonMapper.createArrayNode()
        v.asInstanceOf[java.util.List[AnyRef]].forEach { el =>
          arr.add(avroToJson(el, s.getElementType)); ()
        }
        arr
      case Schema.Type.MAP =>
        val o = jsonMapper.createObjectNode()
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].forEach { (k, el) =>
          o.set[JsonNode](k.toString, avroToJson(el, s.getValueType)); ()
        }
        o
      case Schema.Type.RECORD =>
        val o = jsonMapper.createObjectNode()
        val rec = v.asInstanceOf[GenericRecord]
        s.getFields.forEach { fd =>
          o.set[JsonNode](fd.name, avroToJson(rec.get(fd.pos), fd.schema)); ()
        }
        o
      case Schema.Type.UNION =>
        if (v == null) f.nullNode()
        else {
          val idx = org.apache.avro.generic.GenericData.get().resolveUnion(s, v)
          val branch = s.getTypes.get(idx)
          if (branch.getType == Schema.Type.NULL) f.nullNode()
          else {
            val o = jsonMapper.createObjectNode()
            o.set[JsonNode](unionLabel(branch), avroToJson(v, branch))
            o
          }
        }
    }
  }

  /** JSON text → Avro binary datum (single record, no container file —
    * the wire shape schema-registry payloads use after the 5-byte
    * header).
    */
  def avroEncode(json: UTF8String, schemaJson: String): Array[Byte] = {
    val ctx = avroCtx(schemaJson)
    val datum = jsonToAvro(jsonMapper.readTree(json.toString), ctx.schema)
    ctx.bos.reset()
    ctx.encoder = EncoderFactory.get().directBinaryEncoder(ctx.bos, ctx.encoder)
    ctx.writer.write(datum, ctx.encoder)
    ctx.encoder.flush()
    ctx.bos.toByteArray
  }

  /** Avro binary datum → JSON text (Avro JSON-encoding conventions). */
  def avroDecode(data: Array[Byte], schemaJson: String): UTF8String = {
    val ctx = avroCtx(schemaJson)
    ctx.decoder = DecoderFactory.get().binaryDecoder(data, ctx.decoder)
    val datum = ctx.reader.read(null, ctx.decoder)
    UTF8String.fromString(
      jsonMapper.writeValueAsString(avroToJson(datum, ctx.schema)))
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

  /** Provider-resolved decode: the schema comes from the wire header's
    * id via a [[SchemaProvider]] (the registry-client path) instead of
    * a hard-coded schema. Unknown ids throw — recoverable via the
    * error channel; the config runner guards with the provider's known
    * set so unknown ids never reach this kernel.
    */
  def wireDecodeProvider(data: Array[Byte], provider: SchemaProvider): UTF8String = {
    val id = wireSchemaId(data)
    val schema = provider.schemaFor(id).getOrElse(
      throw new IllegalArgumentException(
        s"schema registry: unknown schema id $id"))
    avroDecode(java.util.Arrays.copyOfRange(data, 5, data.length), schema)
  }

  /** Lenient provider-resolved decode: null for an unknown id instead
    * of a throw. Needed when the provider's known-id set is NOT
    * enumerable (the HTTP registry path) so the caller can't pre-guard
    * with `isin(knownIds)` — the null routes the row to the error
    * channel while the task survives.
    */
  def wireDecodeProviderLenient(data: Array[Byte],
                                provider: SchemaProvider): UTF8String =
    provider.schemaFor(wireSchemaId(data)) match {
      case Some(schema) =>
        avroDecode(java.util.Arrays.copyOfRange(data, 5, data.length), schema)
      case None => null
    }

  /** Provider-resolved encode: subject → latest (id, schema), like the
    * reference's `schema_registry_encode` subject field.
    */
  def wireEncodeSubject(json: UTF8String, subject: String,
                        provider: SchemaProvider): Array[Byte] = {
    val (id, schema) = provider.latestFor(subject).getOrElse(
      throw new IllegalArgumentException(
        s"schema registry: unknown subject '$subject'"))
    wireEncode(json, schema, id)
  }

  // ── YAML → JSON ───────────────────────────────────────────────────────

  private val yamlMapper =
    new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def yamlToJson(yaml: UTF8String): UTF8String =
    UTF8String.fromString(
      jsonMapper.writeValueAsString(yamlMapper.readTree(yaml.toString)))

  /** JSON → YAML text (bloblang `format_yaml`). */
  def jsonToYaml(json: UTF8String): UTF8String =
    UTF8String.fromString(
      yamlMapper.writeValueAsString(jsonMapper.readTree(json.toString)))

  // ── XML → JSON (schemaless; JDK DOM parser — no extra jars;
  //    bloblang parse_xml, reference xml processor
  //    processors/xml.adoc:26 operator to_json) ───────────────────────

  private val dbf = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // harden against XXE: no DTDs, no external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f
  }

  /** Element → JSON with the reference xml operator's conventions:
    * attributes become `-attr` keys, text content of mixed elements
    * becomes `#text`, repeated child names gather into arrays, and a
    * text-only element collapses to its string.
    */
  def xmlToJson(xml: UTF8String): UTF8String = {
    val doc = dbf.newDocumentBuilder().parse(
      new ByteArrayInputStream(xml.toString.getBytes("UTF-8")))
    val f = jsonMapper.getNodeFactory

    def convert(el: org.w3c.dom.Element): JsonNode = {
      val obj = jsonMapper.createObjectNode()
      val attrs = el.getAttributes
      (0 until attrs.getLength).foreach { i =>
        val a = attrs.item(i)
        obj.set[JsonNode]("-" + a.getNodeName, f.textNode(a.getNodeValue))
      }
      val children = el.getChildNodes
      var text = new StringBuilder
      val byName = new java.util.LinkedHashMap[String, java.util.List[JsonNode]]()
      (0 until children.getLength).foreach { i =>
        children.item(i) match {
          case e: org.w3c.dom.Element =>
            byName.computeIfAbsent(e.getTagName,
              _ => new java.util.ArrayList[JsonNode]()).add(convert(e))
          case t: org.w3c.dom.Text => text ++= t.getData
          case _ => ()
        }
      }
      val trimmed = text.toString.trim
      if (byName.isEmpty && obj.isEmpty) return f.textNode(trimmed)
      if (trimmed.nonEmpty) obj.set[JsonNode]("#text", f.textNode(trimmed))
      byName.forEach { (name, nodes) =>
        if (nodes.size() == 1) obj.set[JsonNode](name, nodes.get(0))
        else {
          val arr = jsonMapper.createArrayNode()
          nodes.forEach(n => { arr.add(n); () })
          obj.set[JsonNode](name, arr)
        }
      }
      obj
    }

    val root = jsonMapper.createObjectNode()
    root.set[JsonNode](doc.getDocumentElement.getTagName,
      convert(doc.getDocumentElement))
    UTF8String.fromString(jsonMapper.writeValueAsString(root))
  }

  /** JSON → XML text (bloblang format_xml; inverse conventions of
    * [[xmlToJson]]: `-key` attributes, `#text` content, arrays repeat
    * the element).
    */
  def jsonToXml(json: UTF8String): UTF8String = {
    val root = jsonMapper.readTree(json.toString)
    val sb = new java.lang.StringBuilder
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    def writeEl(name: String, n: JsonNode): Unit = n match {
      case o if o.isObject =>
        sb.append('<').append(name)
        o.properties().forEach { e =>
          if (e.getKey.startsWith("-"))
            sb.append(' ').append(e.getKey.substring(1)).append("=\"")
              .append(esc(e.getValue.asText)).append('"')
        }
        sb.append('>')
        o.properties().forEach { e =>
          if (!e.getKey.startsWith("-")) {
            if (e.getKey == "#text") sb.append(esc(e.getValue.asText))
            else if (e.getValue.isArray)
              e.getValue.forEach(el => writeEl(e.getKey, el))
            else writeEl(e.getKey, e.getValue)
          }
        }
        sb.append("</").append(name).append('>')
      case a if a.isArray => a.forEach(el => writeEl(name, el))
      case leaf =>
        sb.append('<').append(name).append('>')
          .append(esc(leaf.asText)).append("</").append(name).append('>')
    }
    require(root.isObject && root.size() == 1,
      "format_xml needs a single-rooted object")
    val e = root.properties().iterator().next()
    writeEl(e.getKey, e.getValue)
    UTF8String.fromString(sb.toString)
  }

  // ── named-group regex extraction (bloblang re_find_object /
  //    re_find_all_object, methods.adoc regexp section) ───────────────

  private val groupNameRe =
    java.util.regex.Pattern.compile("\\(\\?<([A-Za-z][A-Za-z0-9]*)>")

  /** Named captures of the first match (or every match when `all`) as a
    * JSON object / array of objects; unnamed patterns use "0","1",…
    * positional keys like the reference.
    */
  def reFindObject(s: UTF8String, pattern: String, all: Boolean): UTF8String = {
    val names = {
      val m = groupNameRe.matcher(pattern)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group(1)
      b.result()
    }
    val p = java.util.regex.Pattern.compile(pattern)
    val m = p.matcher(s.toString)
    def obj(): JsonNode = {
      val o = jsonMapper.createObjectNode()
      if (names.nonEmpty)
        names.foreach { n =>
          Option(m.group(n)).foreach(v => { o.put(n, v); () })
        }
      else
        (0 to m.groupCount()).foreach { i =>
          Option(m.group(i)).foreach(v => { o.put(i.toString, v); () })
        }
      o
    }
    val out: JsonNode =
      if (all) {
        val arr = jsonMapper.createArrayNode()
        while (m.find()) { arr.add(obj()); () }
        arr
      } else if (m.find()) obj()
      else jsonMapper.createObjectNode()
    UTF8String.fromString(jsonMapper.writeValueAsString(out))
  }

  // ── JWT (jjwt ships with Spark's jars; reference sign_jwt_*/
  //    parse_jwt_* methods, methods.adoc jwt section). HS takes a
  //    shared secret; RS/ES take PEM key material (PKCS#8 private key
  //    to sign, X.509/SPKI public key to verify) via java.security. ──

  private def hmacKey(secret: UTF8String): javax.crypto.SecretKey =
    io.jsonwebtoken.security.Keys.hmacShaKeyFor(secret.getBytes)

  private def sigFor(algo: String): io.jsonwebtoken.security.MacAlgorithm =
    algo match {
      case "HS256" => io.jsonwebtoken.Jwts.SIG.HS256
      case "HS384" => io.jsonwebtoken.Jwts.SIG.HS384
      case "HS512" => io.jsonwebtoken.Jwts.SIG.HS512
    }

  private def pkSigFor(algo: String): io.jsonwebtoken.security.SignatureAlgorithm =
    algo match {
      case "RS256" => io.jsonwebtoken.Jwts.SIG.RS256
      case "RS384" => io.jsonwebtoken.Jwts.SIG.RS384
      case "RS512" => io.jsonwebtoken.Jwts.SIG.RS512
      case "ES256" => io.jsonwebtoken.Jwts.SIG.ES256
      case "ES384" => io.jsonwebtoken.Jwts.SIG.ES384
      case "ES512" => io.jsonwebtoken.Jwts.SIG.ES512
    }

  private def pemBytes(pem: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(
      pem.replaceAll("-----[A-Z ]+-----", "").replaceAll("\\s", ""))

  private def keyFactoryFor(algo: String): java.security.KeyFactory =
    java.security.KeyFactory.getInstance(
      if (algo.startsWith("RS")) "RSA" else "EC")

  def signJwtHs(claimsJson: UTF8String, secret: UTF8String,
                algo: String): UTF8String = {
    val claims: java.util.Map[String, AnyRef] = jsonMapper.readValue(
      claimsJson.toString,
      classOf[java.util.HashMap[String, AnyRef]])
    val builder = io.jsonwebtoken.Jwts.builder().claims(claims)
    val signed =
      if (algo.startsWith("HS")) builder.signWith(hmacKey(secret), sigFor(algo))
      else builder.signWith(
        keyFactoryFor(algo).generatePrivate(
          new java.security.spec.PKCS8EncodedKeySpec(pemBytes(secret.toString))),
        pkSigFor(algo))
    UTF8String.fromString(signed.compact())
  }

  /** Verifies the signature (wrong-key tokens throw — recoverable via
    * the error channel) and returns the claims as JSON.
    */
  def parseJwtHs(token: UTF8String, secret: UTF8String,
                 algo: String): UTF8String = {
    val parser = io.jsonwebtoken.Jwts.parser()
    val built =
      if (algo.startsWith("HS")) parser.verifyWith(hmacKey(secret))
      else parser.verifyWith(keyFactoryFor(algo).generatePublic(
        new java.security.spec.X509EncodedKeySpec(pemBytes(secret.toString))))
    val claims = built.build()
      .parseSignedClaims(token.toString).getPayload
    UTF8String.fromString(jsonMapper.writeValueAsString(claims))
  }

  /** ISO-8601 duration ("PT1H30M", "P2DT3H") → nanoseconds
    * (bloblang parse_duration_iso8601).
    */
  def parseDurationIso(s: UTF8String): Long =
    java.time.Duration.parse(s.toString).toNanos

  /** Go-style duration string ("1h30m", "250ms", "2h45m30s") →
    * nanoseconds (bloblang parse_duration).
    */
  def parseDuration(s: UTF8String): Long = {
    val m = java.util.regex.Pattern
      .compile("(\\d+(?:\\.\\d+)?)(ns|us|µs|ms|s|m|h)")
      .matcher(s.toString)
    var total = 0.0
    var any = false
    while (m.find()) {
      any = true
      val v = m.group(1).toDouble
      total += v * (m.group(2) match {
        case "ns" => 1.0
        case "us" | "µs" => 1e3
        case "ms" => 1e6
        case "s" => 1e9
        case "m" => 6e10
        case "h" => 3.6e12
      })
    }
    require(any, s"not a duration: $s")
    total.toLong
  }

  // ── MessagePack (hand-rolled against the public spec — no msgpack jar
  //    ships with Spark; reference `msgpack` processor,
  //    processors/msgpack.adoc:26) ─────────────────────────────────────

  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  /** JSON text → msgpack bytes. Minimal-width encodings (fixint/fixstr/
    * fixarray/fixmap where they fit) so output is canonical.
    */
  def msgpackEncode(json: UTF8String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def be16(n: Int): Unit = { bos.write(n >> 8); bos.write(n) }
    def be32(n: Int): Unit = { be16(n >>> 16); be16(n) }
    def be64(n: Long): Unit = { be32((n >>> 32).toInt); be32(n.toInt) }
    def write(n: JsonNode): Unit = n match {
      case _ if n.isNull => bos.write(0xc0)
      case _ if n.isBoolean => bos.write(if (n.asBoolean) 0xc3 else 0xc2)
      case _ if n.isIntegralNumber =>
        val v = n.asLong
        if (v >= -32 && v <= 127) bos.write(v.toInt & 0xff)
        else { bos.write(0xd3); be64(v) }
      case _ if n.isNumber =>
        bos.write(0xcb); be64(java.lang.Double.doubleToLongBits(n.asDouble))
      case _ if n.isTextual =>
        val b = n.asText.getBytes("UTF-8")
        if (b.length <= 31) bos.write(0xa0 | b.length)
        else if (b.length <= 0xff) { bos.write(0xd9); bos.write(b.length) }
        else if (b.length <= 0xffff) { bos.write(0xda); be16(b.length) }
        else { bos.write(0xdb); be32(b.length) }
        bos.write(b)
      case a: ArrayNode =>
        if (a.size <= 15) bos.write(0x90 | a.size)
        else if (a.size <= 0xffff) { bos.write(0xdc); be16(a.size) }
        else { bos.write(0xdd); be32(a.size) }
        a.forEach(write(_))
      case o: ObjectNode =>
        if (o.size <= 15) bos.write(0x80 | o.size)
        else if (o.size <= 0xffff) { bos.write(0xde); be16(o.size) }
        else { bos.write(0xdf); be32(o.size) }
        o.properties().forEach { e =>
          write(jsonMapper.getNodeFactory.textNode(e.getKey)); write(e.getValue)
        }
      case other =>
        throw new IllegalArgumentException(s"msgpack: unsupported node $other")
    }
    write(jsonMapper.readTree(json.toString))
    bos.toByteArray
  }

  /** msgpack bytes → JSON text. */
  def msgpackDecode(data: Array[Byte]): UTF8String = {
    val buf = java.nio.ByteBuffer.wrap(data)
    def readStr(len: Int): String = {
      val b = new Array[Byte](len); buf.get(b); new String(b, "UTF-8")
    }
    def read(): JsonNode = {
      val f = jsonMapper.getNodeFactory
      val b = buf.get() & 0xff
      b match {
        case 0xc0 => f.nullNode()
        case 0xc2 => f.booleanNode(false)
        case 0xc3 => f.booleanNode(true)
        case 0xcb => f.numberNode(java.lang.Double.longBitsToDouble(buf.getLong))
        case 0xca => f.numberNode(buf.getFloat.toDouble)
        case 0xcc => f.numberNode((buf.get() & 0xff).toLong)
        case 0xcd => f.numberNode((buf.getShort & 0xffff).toLong)
        case 0xce => f.numberNode(buf.getInt.toLong & 0xffffffffL)
        case 0xcf | 0xd3 => f.numberNode(buf.getLong)
        case 0xd0 => f.numberNode(buf.get().toLong)
        case 0xd1 => f.numberNode(buf.getShort.toLong)
        case 0xd2 => f.numberNode(buf.getInt.toLong)
        case 0xd9 => f.textNode(readStr(buf.get() & 0xff))
        case 0xda => f.textNode(readStr(buf.getShort & 0xffff))
        case 0xdb => f.textNode(readStr(buf.getInt))
        case 0xdc | 0xdd =>
          val n = if (b == 0xdc) buf.getShort & 0xffff else buf.getInt
          val a = f.arrayNode(); (0 until n).foreach(_ => a.add(read())); a
        case 0xde | 0xdf =>
          val n = if (b == 0xde) buf.getShort & 0xffff else buf.getInt
          val o = f.objectNode()
          (0 until n).foreach { _ =>
            val k = read().asText(); o.set[JsonNode](k, read()); ()
          }
          o
        case _ if b <= 0x7f => f.numberNode(b.toLong)
        case _ if b >= 0xe0 => f.numberNode((b - 256).toLong)
        case _ if (b & 0xe0) == 0xa0 => f.textNode(readStr(b & 0x1f))
        case _ if (b & 0xf0) == 0x90 =>
          val a = f.arrayNode(); (0 until (b & 0x0f)).foreach(_ => a.add(read())); a
        case _ if (b & 0xf0) == 0x80 =>
          val o = f.objectNode()
          (0 until (b & 0x0f)).foreach { _ =>
            val k = read().asText(); o.set[JsonNode](k, read()); ()
          }
          o
        case other =>
          throw new IllegalArgumentException(f"msgpack: unsupported byte 0x$other%02x")
      }
    }
    UTF8String.fromString(jsonMapper.writeValueAsString(read()))
  }

  // ── Protobuf wire format (hand-rolled against the public proto3
  //    encoding spec — no protobuf-java ships with Spark; reference
  //    `protobuf` processor, processors/protobuf.adoc:26) ─────────────

  /** Schema DSL: `"<num>:<name>:<type>[*]"` comma-separated; types
    * int32/int64/bool (varint), double (fixed64), float (fixed32),
    * string/bytes (length-delimited); `*` marks repeated (unpacked).
    * Example: `1:id:int64,2:name:string,3:price:double,4:tags:string*`.
    */
  private case class PField(num: Int, name: String, tpe: String, repeated: Boolean)

  private val protoSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[PField]]()

  private def protoSchema(s: String): Seq[PField] =
    protoSchemaCache.computeIfAbsent(s, str =>
      str.split(",").toSeq.map { f =>
        val Array(num, name, t0) = f.trim.split(":")
        val repeated = t0.endsWith("*")
        PField(num.toInt, name, if (repeated) t0.dropRight(1) else t0, repeated)
      })

  private def writeVarint(bos: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
  }

  /** JSON object → proto3 wire bytes per the schema DSL. Absent fields
    * and proto3 defaults (0, "", false) are omitted, matching canonical
    * proto3 serialization.
    */
  def protoEncode(json: UTF8String, schemaStr: String): Array[Byte] = {
    val doc = jsonMapper.readTree(json.toString)
    val bos = new ByteArrayOutputStream()
    def writeOne(f: PField, v: JsonNode): Unit = f.tpe match {
      case "int32" | "int64" =>
        if (v.asLong != 0 || f.repeated) {
          writeVarint(bos, (f.num << 3) | 0); writeVarint(bos, v.asLong)
        }
      case "bool" =>
        if (v.asBoolean || f.repeated) {
          writeVarint(bos, (f.num << 3) | 0); bos.write(if (v.asBoolean) 1 else 0)
        }
      case "double" =>
        if (v.asDouble != 0 || f.repeated) {
          writeVarint(bos, (f.num << 3) | 1)
          val bits = java.lang.Double.doubleToLongBits(v.asDouble)
          (0 until 8).foreach(i => bos.write(((bits >>> (8 * i)) & 0xff).toInt))
        }
      case "float" =>
        if (v.asDouble != 0 || f.repeated) {
          writeVarint(bos, (f.num << 3) | 5)
          val bits = java.lang.Float.floatToIntBits(v.asDouble.toFloat)
          (0 until 4).foreach(i => bos.write((bits >>> (8 * i)) & 0xff))
        }
      case "string" | "bytes" =>
        val b =
          if (f.tpe == "string") v.asText.getBytes("UTF-8")
          else java.util.Base64.getDecoder.decode(v.asText)
        if (b.nonEmpty || f.repeated) {
          writeVarint(bos, (f.num << 3) | 2); writeVarint(bos, b.length)
          bos.write(b)
        }
      case other => throw new IllegalArgumentException(s"proto type: $other")
    }
    protoSchema(schemaStr).foreach { f =>
      val v = doc.get(f.name)
      if (v != null && !v.isNull) {
        if (f.repeated) v.forEach(writeOne(f, _)) else writeOne(f, v)
      }
    }
    bos.toByteArray
  }

  /** proto3 wire bytes → JSON object. Unknown fields are skipped (the
    * spec's forward-compat rule); absent fields materialize proto3
    * defaults so decode(encode(x)) is total.
    */
  def protoDecode(data: Array[Byte], schemaStr: String): UTF8String = {
    val schema = protoSchema(schemaStr)
    val byNum = schema.map(f => f.num -> f).toMap
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def readVarint(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = buf.get() & 0xff; v |= (b & 0x7fL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      v
    }
    val f = jsonMapper.getNodeFactory
    val out = f.objectNode()
    val reps = scala.collection.mutable.Map.empty[String, com.fasterxml.jackson.databind.node.ArrayNode]
    while (buf.hasRemaining) {
      val tag = readVarint()
      val (num, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      val node: Option[(PField, JsonNode)] = byNum.get(num) match {
        case Some(fd) =>
          val v: JsonNode = (fd.tpe, wire) match {
            case ("int32" | "int64", 0) => f.numberNode(readVarint())
            case ("bool", 0) => f.booleanNode(readVarint() != 0)
            case ("double", 1) => f.numberNode(buf.getDouble)
            case ("float", 5) => f.numberNode(buf.getFloat.toDouble)
            case ("string", 2) =>
              val b = new Array[Byte](readVarint().toInt); buf.get(b)
              f.textNode(new String(b, "UTF-8"))
            case ("bytes", 2) =>
              val b = new Array[Byte](readVarint().toInt); buf.get(b)
              f.textNode(java.util.Base64.getEncoder.encodeToString(b))
            case (t, w) => throw new IllegalArgumentException(
              s"field ${fd.name}: type $t with wire type $w")
          }
          Some((fd, v))
        case None =>
          // unknown field: skip by wire type
          wire match {
            case 0 => readVarint(); ()
            case 1 => buf.position(buf.position() + 8); ()
            case 2 =>
              // read the length FIRST — it advances the buffer
              val len = readVarint().toInt
              buf.position(buf.position() + len); ()
            case 5 => buf.position(buf.position() + 4); ()
            case w => throw new IllegalArgumentException(s"wire type $w")
          }
          None
      }
      node.foreach { case (fd, v) =>
        if (fd.repeated) {
          val arr = reps.getOrElseUpdate(fd.name,
            { val a = f.arrayNode(); out.set[JsonNode](fd.name, a); a })
          arr.add(v)
          ()
        } else { out.set[JsonNode](fd.name, v); () }
      }
    }
    // proto3 defaults for absent singular fields
    schema.filterNot(f0 => out.has(f0.name)).foreach { fd =>
      val v: JsonNode =
        if (fd.repeated) f.arrayNode()
        else fd.tpe match {
          case "int32" | "int64" => f.numberNode(0L)
          case "bool" => f.booleanNode(false)
          case "double" | "float" => f.numberNode(0.0)
          case _ => f.textNode("")
        }
      out.set[JsonNode](fd.name, v)
      ()
    }
    UTF8String.fromString(jsonMapper.writeValueAsString(out))
  }

  // ── JSON Schema validation (subset; reference `json_schema`
  //    processor, processors/json_schema.adoc:26) ──────────────────────

  private val schemaCache2 =
    new java.util.concurrent.ConcurrentHashMap[String, JsonNode]()

  /** First violation as a message string, or null when the document
    * validates. Supported keywords: type, properties, required, items,
    * enum, minimum, maximum, minLength, maxLength, pattern — the subset
    * the reference's test configs exercise.
    */
  def jsonSchemaCheck(json: UTF8String, schemaJson: String): UTF8String = {
    val schema = schemaCache2.computeIfAbsent(schemaJson, jsonMapper.readTree(_))
    val doc =
      try jsonMapper.readTree(json.toString)
      catch { case _: Exception => return UTF8String.fromString("invalid JSON") }

    def typeOk(t: String, n: JsonNode): Boolean = t match {
      case "object" => n.isObject
      case "array" => n.isArray
      case "string" => n.isTextual
      case "integer" => n.isIntegralNumber
      case "number" => n.isNumber
      case "boolean" => n.isBoolean
      case "null" => n.isNull
      case _ => false
    }

    def check(s: JsonNode, n: JsonNode, path: String): String = {
      if (s.has("type") && !typeOk(s.get("type").asText, n))
        return s"$path: expected ${s.get("type").asText}"
      if (s.has("enum")) {
        val ok = s.get("enum").elements()
        var found = false
        while (ok.hasNext && !found) found = ok.next() == n
        if (!found) return s"$path: not in enum"
      }
      if (n.isNumber) {
        if (s.has("minimum") && n.asDouble < s.get("minimum").asDouble)
          return s"$path: below minimum"
        if (s.has("maximum") && n.asDouble > s.get("maximum").asDouble)
          return s"$path: above maximum"
      }
      if (n.isTextual) {
        val len = n.asText.length
        if (s.has("minLength") && len < s.get("minLength").asInt)
          return s"$path: shorter than minLength"
        if (s.has("maxLength") && len > s.get("maxLength").asInt)
          return s"$path: longer than maxLength"
        if (s.has("pattern") &&
            !java.util.regex.Pattern.compile(s.get("pattern").asText)
              .matcher(n.asText).find())
          return s"$path: pattern mismatch"
      }
      if (n.isObject) {
        if (s.has("required")) {
          val it = s.get("required").elements()
          while (it.hasNext) {
            val k = it.next().asText
            if (!n.has(k)) return s"$path: missing required '$k'"
          }
        }
        if (s.has("properties")) {
          val it = s.get("properties").properties().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (n.has(e.getKey)) {
              val err = check(e.getValue, n.get(e.getKey), s"$path.${e.getKey}")
              if (err != null) return err
            }
          }
        }
      }
      if (n.isArray && s.has("items")) {
        var i = 0
        while (i < n.size) {
          val err = check(s.get("items"), n.get(i), s"$path[$i]")
          if (err != null) return err
          i += 1
        }
      }
      null
    }

    val err = check(schema, doc, "$")
    if (err == null) null else UTF8String.fromString(err)
  }

  /** `json_documents` scanner kernel: split CONCATENATED json
    * documents at depth-0 boundaries — quote/escape aware over objects
    * and arrays, top-level scalars split on whitespace
    * (scanners/json_documents.adoc; newlines are optional in the
    * format, so a line scanner cannot do this).
    */
  def jsonDocuments(s: UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && str.charAt(i).isWhitespace) i += 1
      if (i < n) {
        val start = i
        var depth = 0
        var inString = false
        var escaped = false
        var done = false
        while (i < n && !done) {
          val c = str.charAt(i)
          if (inString) {
            if (escaped) escaped = false
            else if (c == '\\') escaped = true
            else if (c == '"') inString = false
          } else c match {
            case '"' => inString = true
            case '{' | '[' => depth += 1
            case '}' | ']' =>
              depth -= 1
              if (depth == 0) done = true
            case _ if depth == 0 && c.isWhitespace => done = true
            case _ => ()
          }
          if (!done) i += 1
          else if (depth == 0 && (c == '}' || c == ']')) i += 1
        }
        out += UTF8String.fromString(str.substring(start, i))
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}
