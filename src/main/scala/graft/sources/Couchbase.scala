package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

/** `couchbase` processor/cache/output
  * (internal/impl/couchbase/processor.go:60, cache.go:42 — contract
  * only, no code ported: the reference wraps the official gocb SDK;
  * this speaks Couchbase's PUBLIC KV wire format — the memcached
  * BINARY protocol with vbucket routing):
  *
  *   - 24-byte frames: magic 0x80/0x81, opcode, key/extras lengths,
  *     vbucket (request) / status (response), total body, opaque,
  *     CAS; SET-class ops carry 8 extras bytes (flags + expiry);
  *   - opcodes GET 0x00 / SET 0x01 / ADD 0x02 / REPLACE 0x03 /
  *     DELETE 0x04; statuses 0x0000 OK, 0x0001 KEY_ENOENT,
  *     0x0002 KEY_EEXISTS;
  *   - vbucket id = CRC32(key) >> 16 & 0x7FFF mod 1024 — Couchbase's
  *     documented client-side mapping, validated by the server.
  *
  * Operations mirror the reference's processor enum: get (replaces
  * message content; a miss feeds the error channel), insert (ADD),
  * replace, upsert (SET), remove (DELETE).
  *
  * Scale shape: one connection per partition, ops stream per message
  * (mapPartitions) — the executor-side fan-out of the reference's
  * batched processor.
  */
object Couchbase {

  val NumVbuckets = 1024

  def vbucketOf(key: String): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(key.getBytes(UTF_8))
    (((crc.getValue >> 16) & 0x7FFF) % NumVbuckets).toInt
  }

  final case class Frame(magic: Int, opcode: Int, vbucketOrStatus: Int,
                         opaque: Int, cas: Long, extras: Array[Byte],
                         key: String, value: Array[Byte])

  object Codec {
    def encode(f: Frame): Array[Byte] = {
      val keyB = f.key.getBytes(UTF_8)
      val out = new ByteArrayOutputStream()
      val o = new DataOutputStream(out)
      o.writeByte(f.magic)
      o.writeByte(f.opcode)
      o.writeShort(keyB.length)
      o.writeByte(f.extras.length)
      o.writeByte(0) // raw data type
      o.writeShort(f.vbucketOrStatus)
      o.writeInt(f.extras.length + keyB.length + f.value.length)
      o.writeInt(f.opaque)
      o.writeLong(f.cas)
      o.write(f.extras)
      o.write(keyB)
      o.write(f.value)
      out.toByteArray
    }

    def decode(b: Array[Byte]): (Frame, Int) = {
      require(b.length >= 24, "couchbase: short frame")
      def u16(i: Int) = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
      def i32(i: Int) = (0 until 4).foldLeft(0)((a, j) =>
        (a << 8) | (b(i + j) & 0xFF))
      def i64(i: Int) = (0 until 8).foldLeft(0L)((a, j) =>
        (a << 8) | (b(i + j) & 0xFF))
      val keyLen = u16(2)
      val extrasLen = b(4) & 0xFF
      val totalBody = i32(8)
      require(b.length >= 24 + totalBody, "couchbase: truncated body")
      val extras = b.slice(24, 24 + extrasLen)
      val key = new String(b, 24 + extrasLen, keyLen, UTF_8)
      val value = b.slice(24 + extrasLen + keyLen, 24 + totalBody)
      (Frame(b(0) & 0xFF, b(1) & 0xFF, u16(6), i32(12), i64(16),
        extras, key, value), 24 + totalBody)
    }

    def setExtras(flags: Int, expiry: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val o = new DataOutputStream(out)
      o.writeInt(flags); o.writeInt(expiry)
      out.toByteArray
    }
  }

  // opcodes / statuses
  val OpGet = 0x00
  val OpSet = 0x01
  val OpAdd = 0x02
  val OpReplace = 0x03
  val OpDelete = 0x04
  val StatusOk = 0x0000
  val StatusNotFound = 0x0001
  val StatusExists = 0x0002
  val StatusWrongVbucket = 0x0007

  /** One request frame in, one response frame out (wire bytes). */
  type Transport = Array[Byte] => Array[Byte]

  /** In-memory bucket: enforces the vbucket mapping like a real node
    * (a request routed to the wrong vbucket is NOT_MY_VBUCKET).
    */
  final class Server {
    private val docs =
      mutable.LinkedHashMap.empty[String, (Array[Byte], Long)]
    private var casCounter = 0L

    def handle(reqBytes: Array[Byte]): Array[Byte] = synchronized {
      val (req, _) = Codec.decode(reqBytes)
      require(req.magic == 0x80, "couchbase: not a request frame")
      def resp(status: Int, value: Array[Byte] = Array.empty,
               cas: Long = 0L) =
        Codec.encode(Frame(0x81, req.opcode, status, req.opaque, cas,
          Array.empty, "", value))
      if (req.opcode != OpGet && req.vbucketOrStatus != vbucketOf(req.key))
        return resp(StatusWrongVbucket)
      req.opcode match {
        case OpGet => docs.get(req.key) match {
          case Some((v, cas)) => resp(StatusOk, v, cas)
          case None => resp(StatusNotFound)
        }
        case OpSet =>
          casCounter += 1
          docs(req.key) = (req.value, casCounter)
          resp(StatusOk, cas = casCounter)
        case OpAdd =>
          if (docs.contains(req.key)) resp(StatusExists)
          else {
            casCounter += 1
            docs(req.key) = (req.value, casCounter)
            resp(StatusOk, cas = casCounter)
          }
        case OpReplace =>
          if (!docs.contains(req.key)) resp(StatusNotFound)
          else {
            casCounter += 1
            docs(req.key) = (req.value, casCounter)
            resp(StatusOk, cas = casCounter)
          }
        case OpDelete =>
          if (docs.remove(req.key).isDefined) resp(StatusOk)
          else resp(StatusNotFound)
        case other => resp(0x0081) // unknown command
      }
    }

    def keys: Seq[String] = synchronized { docs.keys.toSeq }
    def get(k: String): Option[String] =
      synchronized { docs.get(k).map(v => new String(v._1, UTF_8)) }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Server]()
  def named(name: String): Server =
    registry.computeIfAbsent(name, _ => new Server())
  def drop(name: String): Unit = registry.remove(name)

  def transportFor(url: String): Transport =
    if (url.startsWith("mem://") || url.startsWith("couchbase://mem/"))
      named(url.stripPrefix("couchbase://mem/").stripPrefix("mem://")).handle
    else { req =>
      val clean = url.stripPrefix("couchbase://")
      val Array(host, port) = clean.split(":", 2)
      val sock = new java.net.Socket(host, port.toInt)
      try {
        sock.getOutputStream.write(req)
        sock.getOutputStream.flush()
        val in = sock.getInputStream
        val head = new Array[Byte](24)
        var got = 0
        while (got < 24) {
          val n = in.read(head, got, 24 - got)
          require(n > 0, "couchbase: connection closed"); got += n
        }
        val totalBody = (0 until 4).foldLeft(0)((a, j) =>
          (a << 8) | (head(8 + j) & 0xFF))
        val body = new Array[Byte](totalBody)
        got = 0
        while (got < totalBody) {
          val n = in.read(body, got, totalBody - got)
          require(n > 0, "couchbase: connection closed"); got += n
        }
        head ++ body
      } finally sock.close()
    }

  final class Client(url: String) extends Serializable {
    @transient private lazy val t = transportFor(url)
    private def roundTrip(op: Int, key: String,
                          value: Array[Byte] = Array.empty,
                          extras: Array[Byte] = Array.empty): Frame = {
      val req = Frame(0x80, op, vbucketOf(key), 1, 0L, extras, key, value)
      Codec.decode(t(Codec.encode(req)))._1
    }
    def get(key: String): Option[String] = {
      val r = roundTrip(OpGet, key)
      if (r.vbucketOrStatus == StatusOk) Some(new String(r.value, UTF_8))
      else None
    }
    def upsert(key: String, value: String): Int =
      roundTrip(OpSet, key, value.getBytes(UTF_8),
        Codec.setExtras(0, 0)).vbucketOrStatus
    def insert(key: String, value: String): Int =
      roundTrip(OpAdd, key, value.getBytes(UTF_8),
        Codec.setExtras(0, 0)).vbucketOrStatus
    def replace(key: String, value: String): Int =
      roundTrip(OpReplace, key, value.getBytes(UTF_8),
        Codec.setExtras(0, 0)).vbucketOrStatus
    def remove(key: String): Int =
      roundTrip(OpDelete, key).vbucketOrStatus
  }

  /** The processor: per-message KV op. `get` replaces the message
    * content (miss → error channel); mutations pass the message
    * through (insert/replace failures → error channel — the
    * reference's per-item error semantics).
    */
  def processor(df0: DataFrame, url: String, op: String, idCol: Column,
                contentCol: Column = null): DataFrame = {
    require(Set("get", "insert", "replace", "upsert", "remove")(op),
      s"couchbase: invalid operation '$op'")
    val df = Envelope.ensure(df0)
      .withColumn("__cbid", idCol.cast("string"))
      .withColumn("__cbv",
        Option(contentCol).getOrElse(col("value")).cast("string"))
    val schema = df.schema
    val vIdx = schema.fieldIndex("value")
    val eIdx = schema.fieldIndex("error")
    val idIdx = schema.fieldIndex("__cbid")
    val cvIdx = schema.fieldIndex("__cbv")
    val opV = op
    val urlV = url
    val out = df.mapPartitions { it =>
      val client = new Client(urlV)
      it.map { row =>
        val vals = row.toSeq.toArray
        val key = row.getString(idIdx)
        opV match {
          case "get" => client.get(key) match {
            case Some(v) => vals(vIdx) = v
            case None => vals(eIdx) = s"couchbase: key not found: $key"
          }
          case "upsert" => client.upsert(key, row.getString(cvIdx))
          case "insert" =>
            if (client.insert(key, row.getString(cvIdx)) == StatusExists)
              vals(eIdx) = s"couchbase: key exists: $key"
          case "replace" =>
            if (client.replace(key, row.getString(cvIdx)) == StatusNotFound)
              vals(eIdx) = s"couchbase: key not found: $key"
          case "remove" =>
            if (client.remove(key) == StatusNotFound)
              vals(eIdx) = s"couchbase: key not found: $key"
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out.drop("__cbid", "__cbv")
  }
}
