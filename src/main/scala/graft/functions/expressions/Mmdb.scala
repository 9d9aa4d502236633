package graft.functions.expressions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** MaxMind DB (.mmdb) file reader — hand-rolled against the PUBLIC
  * MaxMind DB file format spec 2.0 (binary search tree over IP bits +
  * typed data section + metadata map; the format behind the reference's
  * geoip_* Bloblang methods, methods.adoc:4492-4557). No maxmind jar
  * ships with Spark, and the format is small: this reads any
  * GeoLite2/GeoIP2 database.
  *
  * Scale shape: the file loads ONCE per executor JVM (see
  * [[MmdbReader.cached]]) and lookups are in-memory bit walks — the
  * per-row cost is ~depth(32) array reads, no I/O. Ship the db to
  * executors with `--files` and pass the SparkFiles path.
  */
final class MmdbReader(bytes: Array[Byte]) {

  private val F = JsonNodeFactory.instance

  // ── metadata ──────────────────────────────────────────────────────
  private val MetaMarker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  private def lastIndexOfMarker(): Int = {
    var i = bytes.length - MetaMarker.length
    while (i >= 0) {
      var j = 0
      while (j < MetaMarker.length && bytes(i + j) == MetaMarker(j)) j += 1
      if (j == MetaMarker.length) return i
      i -= 1
    }
    throw new IllegalArgumentException("not an mmdb file (metadata marker missing)")
  }

  val metadata: JsonNode = {
    val start = lastIndexOfMarker() + MetaMarker.length
    decodeAt(start, start)._1
  }
  val nodeCount: Int = metadata.get("node_count").asInt
  val recordSize: Int = metadata.get("record_size").asInt
  val ipVersion: Int = metadata.get("ip_version").asInt
  require(Seq(24, 28, 32).contains(recordSize), s"record_size $recordSize")
  private val treeBytes = nodeCount * recordSize / 4 // 2 records per node
  private val dataStart = treeBytes + 16 // 16-byte zero separator

  // ── data section decoding (spec §"Data Section") ─────────────────
  /** Decode the value at absolute offset `p`; `base` is the absolute
    * position pointers are relative to. Returns (node, next offset).
    */
  private def decodeAt(p0: Int, base: Int): (JsonNode, Int) = {
    var p = p0
    val ctrl = bytes(p) & 0xff
    p += 1
    var tpe = ctrl >>> 5
    if (tpe == 0) { tpe = 7 + (bytes(p) & 0xff); p += 1 }

    if (tpe == 1) { // pointer — size bits encode width, value is offset
      val ss = (ctrl >>> 3) & 0x3
      val v = ctrl & 0x7
      val ptr = ss match {
        case 0 => (v << 8) | (bytes(p) & 0xff)
        case 1 => ((v << 16) | ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)) + 2048
        case 2 => ((v << 24) | ((bytes(p) & 0xff) << 16) |
          ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)) + 526336
        case _ => ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      }
      val next = p + ss + 1
      return (decodeAt(base + ptr, base)._1, next)
    }

    var size = ctrl & 0x1f
    if (size == 29) { size = 29 + (bytes(p) & 0xff); p += 1 }
    else if (size == 30) {
      size = 285 + ((bytes(p) & 0xff) << 8) + (bytes(p + 1) & 0xff); p += 2
    } else if (size == 31) {
      size = 65821 + ((bytes(p) & 0xff) << 16) +
        ((bytes(p + 1) & 0xff) << 8) + (bytes(p + 2) & 0xff); p += 3
    }

    def uintN(n: Int): Long = {
      var v = 0L
      (0 until n).foreach(i => v = (v << 8) | (bytes(p + i) & 0xff))
      v
    }

    tpe match {
      case 2 => // utf8 string
        (F.textNode(new String(bytes, p, size, "UTF-8")), p + size)
      case 3 => // double
        (F.numberNode(java.lang.Double.longBitsToDouble(uintN(8))), p + 8)
      case 4 => // bytes → base64 text
        (F.textNode(java.util.Base64.getEncoder
          .encodeToString(java.util.Arrays.copyOfRange(bytes, p, p + size))), p + size)
      case 5 | 6 => // uint16/32 (size = byte length, fits a Long)
        (F.numberNode(uintN(size)), p + size)
      case 9 | 10 => // uint64/128 — may exceed Long.MAX; decode unsigned
        (F.numberNode(new java.math.BigInteger(1,
          java.util.Arrays.copyOfRange(bytes, p, p + size))), p + size)
      case 8 => // int32: 4 stored bytes wrap two's-complement; fewer
        // bytes are leading-zero-trimmed non-negative magnitudes (the
        // official MMDB readers decode them unsigned — no sign-extend)
        (F.numberNode(uintN(size).toInt.toLong), p + size)
      case 7 => // map: size entries of key + value
        val o = F.objectNode()
        var q = p
        (0 until size).foreach { _ =>
          val (k, q1) = decodeAt(q, base)
          val (v, q2) = decodeAt(q1, base)
          o.set[JsonNode](k.asText, v)
          q = q2
        }
        (o, q)
      case 11 => // array
        val a = F.arrayNode()
        var q = p
        (0 until size).foreach { _ =>
          val (v, q1) = decodeAt(q, base); a.add(v); q = q1
        }
        (a, q)
      case 14 => (F.booleanNode(size != 0), p)
      case 15 => // float
        (F.numberNode(java.lang.Float.intBitsToFloat(uintN(4).toInt).toDouble), p + 4)
      case other =>
        throw new IllegalArgumentException(s"mmdb: unsupported type $other")
    }
  }

  // ── search tree walk ─────────────────────────────────────────────
  private def record(node: Int, side: Int): Int = recordSize match {
    case 32 =>
      val off = node * 8 + side * 4
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    case 24 =>
      val off = node * 6 + side * 3
      ((bytes(off) & 0xff) << 16) | ((bytes(off + 1) & 0xff) << 8) |
        (bytes(off + 2) & 0xff)
    case 28 =>
      val off = node * 7
      if (side == 0)
        (((bytes(off + 3) & 0xf0) >> 4) << 24) | ((bytes(off) & 0xff) << 16) |
          ((bytes(off + 1) & 0xff) << 8) | (bytes(off + 2) & 0xff)
      else
        ((bytes(off + 3) & 0x0f) << 24) | ((bytes(off + 4) & 0xff) << 16) |
          ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
  }

  /** Look an IPv4 dotted-quad (or full/:: IPv6) up; null when absent. */
  def lookup(ip: String): JsonNode = {
    val bits: Array[Int] = ipBits(ip)
    if (bits == null) return null
    var node = 0
    var i = 0
    while (i < bits.length) {
      if (node >= nodeCount) {
        return if (node == nodeCount) null
        else decodeAt(dataStart + (node - nodeCount - 16), dataStart)._1
      }
      node = record(node, bits(i))
      i += 1
    }
    if (node == nodeCount) null
    else if (node > nodeCount) decodeAt(dataStart + (node - nodeCount - 16), dataStart)._1
    else null
  }

  /** IP → bit array at the tree's depth (IPv4 in a v6 tree walks 96
    * zero bits first, the spec's ::/96 embedding).
    */
  private def ipBits(ip: String): Array[Int] = {
    val v4 = """^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$""".r
    ip match {
      case v4(a, b, c, d) =>
        val parts = Seq(a, b, c, d).map(_.toInt)
        if (parts.exists(_ > 255)) return null
        val v = parts.foldLeft(0L)((acc, x) => (acc << 8) | x)
        val lead = if (ipVersion == 6) Array.fill(96)(0) else Array.empty[Int]
        lead ++ (31 to 0 by -1).map(i => ((v >> i) & 1).toInt)
      case _ =>
        // only parse IPv6 LITERALS — getByName on anything else would
        // do a blocking per-row DNS lookup (and silently geolocate a
        // hostname's resolved address instead of returning null)
        if (!ip.contains(":")) return null
        try {
          val addr = java.net.InetAddress.getByName(ip).getAddress
          if (addr.length == 16 && ipVersion == 4) null
          else addr.flatMap(byteBits)
        } catch { case _: Exception => null }
    }
  }

  private def byteBits(b: Byte): Array[Int] =
    (7 to 0 by -1).map(i => ((b & 0xff) >> i) & 1).toArray
}

object MmdbReader {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, MmdbReader]()

  /** Per-JVM (= per-executor) reader cache: the db file loads once. */
  def cached(path: String): MmdbReader =
    cache.computeIfAbsent(path, p =>
      new MmdbReader(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))))
}

/** Static kernel surface for codegen (see GeoipLookup expression). */
object MmdbOps {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** IP string → record JSON, or null when absent/unparseable. */
  def lookupJson(ip: org.apache.spark.unsafe.types.UTF8String,
                 path: String): org.apache.spark.unsafe.types.UTF8String = {
    val n = MmdbReader.cached(path).lookup(ip.toString)
    if (n == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      mapper.writeValueAsString(n))
  }
}

/** Minimal .mmdb WRITER — exists so the reader (and the geoip_* method
  * surface) can be tested without shipping a real GeoLite2 database.
  * Emits a spec-compliant IPv4 tree with 32-bit records, no pointers.
  */
object MmdbWriter {

  /** Entries: (cidrBase dotted-quad, prefixLen, record). Records may
    * hold strings, numbers (longs/doubles), nested maps.
    */
  def write(path: String, entries: Seq[(String, Int, JsonNode)],
            databaseType: String = "GeoLite2-City-Test"): Unit = {
    // ── trie build ───────────────────────────────────────────────
    final class Node {
      var left: AnyRef = null // Node | Integer (data idx) | null
      var right: AnyRef = null
      var idx: Int = -1
    }
    val root = new Node
    val dataBlobs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // shorter prefixes first: a longer prefix carving into a shorter
    // one SPLITS the covering record down to both halves (longest-
    // prefix-match semantics of the tree)
    entries.sortBy(_._2).foreach { case (base, plen, rec) =>
      val ip = base.split("\\.").map(_.toInt)
        .foldLeft(0L)((acc, x) => (acc << 8) | x)
      val blobIdx = { dataBlobs += encode(rec); dataBlobs.length - 1 }
      var cur = root
      (0 until plen).foreach { d =>
        val bit = ((ip >> (31 - d)) & 1).toInt
        val last = d == plen - 1
        def descend(get: => AnyRef, set: AnyRef => Unit): Unit = {
          if (last) set(Integer.valueOf(blobIdx))
          else {
            get match {
              case n: Node => cur = n
              case covering: Integer =>
                // push the covering record down to both children so the
                // uncarved half keeps resolving to it
                val n2 = new Node
                n2.left = covering; n2.right = covering
                set(n2); cur = n2
              case _ =>
                val n2 = new Node; set(n2); cur = n2
            }
          }
        }
        if (bit == 0) descend(cur.left, cur.left = _)
        else descend(cur.right, cur.right = _)
      }
    }
    // BFS numbering
    val order = scala.collection.mutable.ArrayBuffer.empty[Node]
    val queue = scala.collection.mutable.Queue(root)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      n.idx = order.length; order += n
      n.left match { case c: Node => queue.enqueue(c); case _ => () }
      n.right match { case c: Node => queue.enqueue(c); case _ => () }
    }
    val nodeCount = order.length
    // data section layout
    val dataOffsets = new Array[Int](dataBlobs.length)
    var off = 0
    dataBlobs.zipWithIndex.foreach { case (b, i) =>
      dataOffsets(i) = off; off += b.length
    }
    def recValue(slot: AnyRef): Int = slot match {
      case null => nodeCount
      case c: Node => c.idx
      case i: Integer => nodeCount + 16 + dataOffsets(i.intValue)
    }
    // ── serialize ────────────────────────────────────────────────
    val bos = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      bos.write(v >>> 24); bos.write(v >>> 16); bos.write(v >>> 8); bos.write(v)
    }
    order.foreach { n => be32(recValue(n.left)); be32(recValue(n.right)) }
    (0 until 16).foreach(_ => bos.write(0)) // data section separator
    dataBlobs.foreach(bos.write)
    bos.write(Array(0xab.toByte, 0xcd.toByte, 0xef.toByte))
    bos.write("MaxMind.com".getBytes("US-ASCII"))
    val F = JsonNodeFactory.instance
    val meta = F.objectNode()
    meta.put("binary_format_major_version", 2)
    meta.put("binary_format_minor_version", 0)
    meta.put("node_count", nodeCount)
    meta.put("record_size", 32)
    meta.put("ip_version", 4)
    meta.put("database_type", databaseType)
    meta.set[JsonNode]("languages", F.arrayNode().add("en"))
    meta.set[JsonNode]("description",
      F.objectNode().put("en", "graft test fixture"))
    meta.put("build_epoch", 0L)
    bos.write(encode(meta))
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bos.toByteArray)
  }

  /** Encode one value (string/long/double/bool/map/array), no pointers. */
  private[expressions] def encode(n: JsonNode): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def ctrl(tpe: Int, size: Int): Unit = {
      require(size < 29, s"fixture writer: size $size >= 29 unsupported")
      if (tpe <= 7) bos.write((tpe << 5) | size)
      else { bos.write(size); bos.write(tpe - 7) }
    }
    def write(v: JsonNode): Unit = v match {
      case _ if v.isTextual =>
        val b = v.asText.getBytes("UTF-8")
        if (b.length < 29) ctrl(2, b.length)
        else { bos.write((2 << 5) | 29); bos.write(b.length - 29) }
        bos.write(b)
      case _ if v.isIntegralNumber =>
        val l = v.asLong
        require(l >= 0, "fixture writer: negative ints unsupported")
        val bytes = java.math.BigInteger.valueOf(l).toByteArray
          .dropWhile(_ == 0)
        if (bytes.length <= 4) { ctrl(6, bytes.length); bos.write(bytes) }
        else { ctrl(9, bytes.length); bos.write(bytes) }
      case _ if v.isNumber =>
        ctrl(3, 8)
        val bits = java.lang.Double.doubleToLongBits(v.asDouble)
        (7 to 0 by -1).foreach(i => bos.write(((bits >>> (8 * i)) & 0xff).toInt))
      case _ if v.isBoolean => ctrl(14, if (v.asBoolean) 1 else 0)
      case _ if v.isObject =>
        ctrl(7, v.size)
        v.properties().forEach { e =>
          write(JsonNodeFactory.instance.textNode(e.getKey))
          write(e.getValue)
        }
      case _ if v.isArray =>
        ctrl(11, v.size)
        v.forEach(write(_))
      case other =>
        throw new IllegalArgumentException(s"fixture writer: $other")
    }
    write(n)
    bos.toByteArray
  }
}
