package graft.functions.expressions

import java.io.ByteArrayOutputStream

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** proto3 SCHEMA-FILE support for the `protobuf` processor's real
  * config form (`message:` + `import_paths:`, processors/protobuf.adoc;
  * fixtures config/test/protobuf/{house,people}.yaml): a parser for the
  * proto3 subset those schemas use — packages, imports, nested
  * messages, enums, repeated fields, message-typed fields, the
  * google.protobuf.Timestamp/Any well-knowns — plus the proto3 JSON
  * mapping (lowerCamelCase names, default-value omission, enum names,
  * Timestamp as RFC3339) and the wire codec (varint / fixed / length-
  * delimited over the public encoding spec; no protobuf-java on this
  * classpath). Unknown JSON fields error with the upstream message
  * shape (`unknown field "x"`).
  */
object ProtoSchema {

  private val mapper = new ObjectMapper()

  sealed trait FType
  case object TI32 extends FType
  case object TI64 extends FType
  case object TU32 extends FType
  case object TU64 extends FType
  case object TBool extends FType
  case object TDouble extends FType
  case object TFloat extends FType
  case object TStr extends FType
  case object TBytes extends FType
  final case class TEnumT(byName: Map[String, Int],
                          byNum: Map[Int, String]) extends FType
  final case class TMsg(fqn: String) extends FType

  final case class Field(num: Int, name: String, tpe: FType,
                         repeated: Boolean) {
    val jsonName: String =
      "_([a-z0-9])".r.replaceAllIn(name, m => m.group(1).toUpperCase)
  }
  final case class Message(fqn: String, fields: Seq[Field])

  final class Registry(val messages: Map[String, Message])
      extends Serializable {
    def message(fqn: String): Message = messages.getOrElse(fqn,
      throw new IllegalArgumentException(s"unknown message type $fqn"))
  }

  // ── parser ──────────────────────────────────────────────────────────

  private def stripComments(s: String): String =
    s.replaceAll("//[^\n]*", "").replaceAll("(?s)/\\*.*?\\*/", "")

  /** Split a block body into (field lines, named sub-blocks). */
  private def blocks(body: String): (Seq[String], Seq[(String, String, String)]) = {
    val fields = mutable.Buffer[String]()
    val subs = mutable.Buffer[(String, String, String)]() // kind, name, body
    var i = 0
    val cur = new StringBuilder
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '{') {
        // the text accumulated so far ends with `message Name` / `enum Name`
        val head = cur.toString
        val m = "(message|enum)\\s+(\\w+)\\s*$".r.findFirstMatchIn(head)
          .getOrElse(throw new IllegalArgumentException(
            s"proto parse: unexpected block after '$head'"))
        cur.setLength(0)
        cur.append(head.substring(0, m.start))
        var depth = 1
        val inner = new StringBuilder
        i += 1
        while (depth > 0 && i < body.length) {
          val ch = body.charAt(i)
          if (ch == '{') depth += 1
          else if (ch == '}') depth -= 1
          if (depth > 0) inner.append(ch)
          i += 1
        }
        subs += ((m.group(1), m.group(2), inner.toString))
      } else {
        if (c == ';') { fields += cur.toString.trim; cur.setLength(0) }
        else cur.append(c)
        i += 1
      }
    }
    val last = cur.toString.trim
    if (last.nonEmpty) fields += last
    (fields.toSeq.filter(_.nonEmpty), subs.toSeq)
  }

  private final case class RawField(num: Int, name: String,
                                    typeName: String, repeated: Boolean)
  private final case class RawMsg(fqn: String, fields: Seq[RawField],
                                  scope: Seq[String])

  /** Parse every `.proto` source; `import` statements are satisfied by
    * the set itself (all files of the import path are passed in) plus
    * the built-in well-knowns.
    */
  def parse(sources: Seq[String]): Registry = {
    val rawMsgs = mutable.Buffer[RawMsg]()
    val enums = mutable.Map[String, TEnumT]()

    def walkMsg(pkg: String, path: Seq[String], name: String,
                body: String): Unit = {
      val fqn = (path :+ name).mkString(".")
      val (fieldLines, subs) = blocks(body)
      subs.foreach {
        case ("message", n, b) => walkMsg(pkg, path :+ name, n, b)
        case ("enum", n, b) =>
          val (lines, _) = blocks(b)
          val vals = lines.flatMap { l =>
            "(\\w+)\\s*=\\s*(-?\\d+)".r.findFirstMatchIn(l)
              .map(m => m.group(1) -> m.group(2).toInt)
          }
          enums(((path :+ name) :+ n).mkString(".")) =
            TEnumT(vals.toMap, vals.map(_.swap).toMap)
        case _ => ()
      }
      val fields = fieldLines.flatMap { l =>
        "(?:(repeated)\\s+)?([\\w.]+)\\s+(\\w+)\\s*=\\s*(\\d+)".r
          .findFirstMatchIn(l).filter(_ => !l.startsWith("option") &&
            !l.startsWith("reserved") && !l.startsWith("oneof"))
          .map(m => RawField(m.group(4).toInt, m.group(3), m.group(2),
            m.group(1) != null))
      }
      rawMsgs += RawMsg(fqn, fields, path :+ name)
    }

    sources.foreach { src0 =>
      val src = stripComments(src0)
      val pkg = "package\\s+([\\w.]+)\\s*;".r.findFirstMatchIn(src)
        .map(_.group(1)).getOrElse("")
      // top-level blocks only (strip syntax/package/import lines)
      val top = src.linesIterator
        .filterNot(l => l.trim.startsWith("syntax") ||
          l.trim.startsWith("package") || l.trim.startsWith("import"))
        .mkString("\n")
      val (_, subs) = blocks(top)
      val pkgPath = if (pkg.isEmpty) Seq.empty else pkg.split("\\.").toSeq
      subs.foreach {
        case ("message", n, b) => walkMsg(pkg, pkgPath, n, b)
        case ("enum", n, b) =>
          val (lines, _) = blocks(b)
          val vals = lines.flatMap { l =>
            "(\\w+)\\s*=\\s*(-?\\d+)".r.findFirstMatchIn(l)
              .map(m => m.group(1) -> m.group(2).toInt)
          }
          enums((pkgPath :+ n).mkString(".")) =
            TEnumT(vals.toMap, vals.map(_.swap).toMap)
        case _ => ()
      }
    }

    val msgFqns = rawMsgs.map(_.fqn).toSet ++
      Set("google.protobuf.Timestamp", "google.protobuf.Any")

    def resolve(scope: Seq[String], tn: String): FType = tn match {
      case "int32" | "sint32" | "sfixed32" => TI32
      case "int64" | "sint64" | "sfixed64" => TI64
      case "uint32" | "fixed32" => TU32
      case "uint64" | "fixed64" => TU64
      case "bool" => TBool
      case "double" => TDouble
      case "float" => TFloat
      case "string" => TStr
      case "bytes" => TBytes
      case other =>
        // innermost enclosing scope wins, then outer, then as written
        val candidates = scope.indices.reverse
          .map(i => (scope.take(i + 1) :+ other).mkString(".")) :+ other
        candidates.collectFirst {
          case c if enums.contains(c) => enums(c)
          case c if msgFqns.contains(c) => TMsg(c)
        }.getOrElse(throw new IllegalArgumentException(
          s"proto parse: unresolved type '$other' in ${scope.mkString(".")}"))
    }

    val builtin = Seq(
      Message("google.protobuf.Timestamp", Seq(
        Field(1, "seconds", TI64, repeated = false),
        Field(2, "nanos", TI32, repeated = false))),
      Message("google.protobuf.Any", Seq(
        Field(1, "type_url", TStr, repeated = false),
        Field(2, "value", TBytes, repeated = false))))
    val msgs = rawMsgs.map(rm => Message(rm.fqn,
      rm.fields.map(rf => Field(rf.num, rf.name,
        resolve(rm.scope, rf.typeName), rf.repeated)))) ++ builtin
    new Registry(msgs.map(m => m.fqn -> m).toMap)
  }

  private val registryCache =
    new java.util.concurrent.ConcurrentHashMap[String, Registry]()

  val FileSep = "\n#---PROTO-FILE---\n"

  /** Registry from FileSep-joined sources, cached by content (the
    * executor-safe form -- closures capture the text, each JVM parses
    * once).
    */
  def registryFor(joined: String): Registry =
    registryCache.computeIfAbsent(joined,
      t => parse(t.split(java.util.regex.Pattern.quote(FileSep)).toSeq))

  // ── wire codec ─────────────────────────────────────────────────────

  private def writeVarint(o: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }

  private def wireType(t: FType): Int = t match {
    case TDouble => 1
    case TFloat => 5
    case TStr | TBytes | _: TMsg => 2
    case _ => 0
  }

  private def isDefault(t: FType, v: JsonNode): Boolean = t match {
    case TStr => v.asText("").isEmpty
    case TBytes => v.asText("").isEmpty
    case TBool => !v.asBoolean(false)
    case TDouble | TFloat => v.asDouble(0) == 0.0
    case e: TEnumT =>
      (if (v.isNumber) v.asInt else e.byName.getOrElse(v.asText, -1)) == 0
    case _: TMsg => false
    case _ => v.asLong(0) == 0L
  }

  def jsonToWire(reg: Registry, fqn: String, node: JsonNode): Array[Byte] = {
    if (fqn == "google.protobuf.Timestamp" && node.isTextual) {
      val inst = java.time.Instant.parse(node.asText)
      val o = mapper.createObjectNode()
      o.put("seconds", inst.getEpochSecond)
      o.put("nanos", inst.getNano)
      return jsonToWireObj(reg, fqn, o)
    }
    require(node.isObject, s"expected a JSON object for $fqn, got $node")
    jsonToWireObj(reg, fqn, node.asInstanceOf[ObjectNode])
  }

  private def jsonToWireObj(reg: Registry, fqn: String,
                            node: ObjectNode): Array[Byte] = {
    val msg = reg.message(fqn)
    val byJson = msg.fields.flatMap(f =>
      Seq(f.jsonName -> f, f.name -> f)).toMap
    // the upstream processor REJECTS unrecognised fields
    node.properties().asScala.foreach { e =>
      if (!byJson.contains(e.getKey))
        throw new IllegalArgumentException(s"""unknown field "${e.getKey}"""")
    }
    val out = new ByteArrayOutputStream()
    msg.fields.foreach { f =>
      val vOpt = Option(node.get(f.jsonName)).orElse(Option(node.get(f.name)))
        .filterNot(_.isNull)
      vOpt.foreach { v =>
        val items = if (f.repeated) {
          require(v.isArray, s"field ${f.jsonName}: expected array")
          v.elements().asScala.toSeq
        } else Seq(v)
        items.foreach { item =>
          if (f.repeated || !isDefault(f.tpe, item)) {
            writeVarint(out, (f.num.toLong << 3) | wireType(f.tpe))
            f.tpe match {
              case TI32 | TI64 | TU32 | TU64 =>
                writeVarint(out, if (item.isTextual) item.asText.toLong
                  else item.asLong)
              case TBool => writeVarint(out, if (item.asBoolean) 1 else 0)
              case e: TEnumT =>
                writeVarint(out, if (item.isNumber) item.asLong
                  else e.byName.getOrElse(item.asText,
                    throw new IllegalArgumentException(
                      s"unknown enum value ${item.asText}")).toLong)
              case TDouble =>
                val b = java.nio.ByteBuffer.allocate(8)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                b.putDouble(item.asDouble); out.write(b.array())
              case TFloat =>
                val b = java.nio.ByteBuffer.allocate(4)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                b.putFloat(item.asDouble.toFloat); out.write(b.array())
              case TStr =>
                val bs = item.asText.getBytes("UTF-8")
                writeVarint(out, bs.length); out.write(bs)
              case TBytes =>
                val bs = java.util.Base64.getDecoder.decode(item.asText)
                writeVarint(out, bs.length); out.write(bs)
              case TMsg(sub) =>
                val bs = jsonToWire(reg, sub, item)
                writeVarint(out, bs.length); out.write(bs)
            }
          }
        }
      }
    }
    out.toByteArray
  }

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      var going = true
      while (going) {
        val b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        going = (b & 0x80) != 0
      }
      v
    }
    def fixed(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    def bytesLen(): Array[Byte] = { val n = varint().toInt; fixed(n) }
  }

  def wireToJson(reg: Registry, fqn: String, bytes: Array[Byte]): JsonNode = {
    if (fqn == "google.protobuf.Timestamp") {
      val o = wireToJsonObj(reg, fqn, bytes)
      val inst = java.time.Instant.ofEpochSecond(
        o.path("seconds").asLong(0), o.path("nanos").asLong(0))
      return mapper.getNodeFactory.textNode(
        java.time.format.DateTimeFormatter.ISO_INSTANT.format(inst))
    }
    wireToJsonObj(reg, fqn, bytes)
  }

  private def wireToJsonObj(reg: Registry, fqn: String,
                            bytes: Array[Byte]): ObjectNode = {
    val msg = reg.message(fqn)
    val byNum = msg.fields.map(f => f.num -> f).toMap
    val o = mapper.createObjectNode()
    val r = new Reader(bytes)
    while (r.hasMore) {
      val tag = r.varint()
      val (num, wt) = ((tag >> 3).toInt, (tag & 7).toInt)
      byNum.get(num) match {
        case None => wt match { // skip unknown (forward compat)
          case 0 => r.varint(); ()
          case 1 => r.fixed(8); ()
          case 5 => r.fixed(4); ()
          case _ => r.bytesLen(); ()
        }
        case Some(f) =>
          val v: JsonNode = f.tpe match {
            case TI32 | TI64 | TU32 | TU64 =>
              mapper.getNodeFactory.numberNode(r.varint())
            case TBool =>
              mapper.getNodeFactory.booleanNode(r.varint() != 0)
            case e: TEnumT =>
              val n = r.varint().toInt
              e.byNum.get(n).map(mapper.getNodeFactory.textNode)
                .getOrElse(mapper.getNodeFactory.numberNode(n))
            case TDouble => mapper.getNodeFactory.numberNode(
              java.nio.ByteBuffer.wrap(r.fixed(8))
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble)
            case TFloat => mapper.getNodeFactory.numberNode(
              java.nio.ByteBuffer.wrap(r.fixed(4))
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat.toDouble)
            case TStr => mapper.getNodeFactory.textNode(
              new String(r.bytesLen(), "UTF-8"))
            case TBytes => mapper.getNodeFactory.textNode(
              java.util.Base64.getEncoder.encodeToString(r.bytesLen()))
            case TMsg(sub) => wireToJson(reg, sub, r.bytesLen())
          }
          if (f.repeated) {
            val arr = Option(o.get(f.jsonName)) match {
              case Some(a: ArrayNode) => a
              case _ => o.putArray(f.jsonName)
            }
            arr.add(v); ()
          } else o.set[JsonNode](f.jsonName, v)
      }
    }
    o
  }
}
