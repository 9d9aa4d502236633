package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}
import java.util.zip.CRC32C

import scala.collection.concurrent.TrieMap
import scala.collection.mutable
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** The Apache Kafka binary wire protocol, hand-rolled on real TCP —
  * the reference's #1 connector family
  * (internal/impl/kafka/input_redpanda.go:103,
  * output_sarama_kafka.go:367, franz_reader_ordered.go) speaks exactly
  * this protocol; here both ends are implemented from the public
  * protocol spec (kafka.apache.org/protocol):
  *
  *   - [[KafkaWire.Server]]: a loopback broker that accepts real
  *     clients — ApiVersions, Metadata v0–12, CreateTopics, Produce
  *     v3–9, Fetch v4–13, ListOffsets v1–7, FindCoordinator v0–4,
  *     the consumer-group state machine (JoinGroup/SyncGroup/
  *     Heartbeat/LeaveGroup with generations and a join barrier),
  *     OffsetCommit, OffsetFetch v2–8. It
  *     VALIDATES record-batch CRC32C on produce (rejecting
  *     CORRUPT_MESSAGE) so the client's encoder is checked by an
  *     independent decoder, not by itself.
  *   - [[KafkaWire.Client]]: implements [[Broker.Transport]] over the
  *     wire, so the partition-ordered writer ([[graft.sinks.Sinks
  *     .brokerWrite]]) and the offset-ordered reader
  *     ([[Sources.brokerRead]]) run UNCHANGED against real Kafka
  *     frames — `kafka://host:port` addresses resolve here via
  *     [[Broker.transportFor]].
  *   - [[KafkaWire.GroupMember]]: a consumer-group session — find
  *     coordinator, join (leader computes the range assignment
  *     client-side, as real Kafka consumers do), sync, heartbeat,
  *     commit/fetch offsets, leave.
  *
  * Record batches are magic-2 (v2) format: zigzag-varint record
  * framing, CRC32C from the attributes field to the batch end,
  * delta-encoded offsets/timestamps, headers, null keys and tombstone
  * (null-value) records. Pre-flexible protocol versions are used
  * throughout (no tagged fields), which real brokers still serve.
  *
  * At scale the shape is the real one: one TCP connection per executor
  * task, produce/fetch parallel across partitions, consumer-group
  * offsets as the resume point — the same contract Spark's own Kafka
  * connector builds on.
  */
object KafkaWire {

  // ── error codes (public protocol) ──────────────────────────────────
  val ErrNone: Short = 0
  val ErrOffsetOutOfRange: Short = 1
  val ErrCorruptMessage: Short = 2
  val ErrUnknownTopicOrPartition: Short = 3
  val ErrIllegalGeneration: Short = 22
  val ErrInconsistentGroupProtocol: Short = 23
  val ErrUnknownMemberId: Short = 25
  val ErrRebalanceInProgress: Short = 27
  val ErrUnsupportedSaslMechanism: Short = 33
  val ErrUnsupportedVersion: Short = 35
  val ErrTopicAlreadyExists: Short = 36
  val ErrOutOfOrderSequence: Short = 45
  val ErrDuplicateSequence: Short = 46
  val ErrInvalidProducerEpoch: Short = 47
  val ErrSaslAuthenticationFailed: Short = 58
  val ErrUnknownProducerId: Short = 59
  val ErrGroupIdNotFound: Short = 69
  val ErrMemberIdRequired: Short = 79
  val ErrUnknownTopicId: Short = 100

  // api keys
  private val ApiProduce = 0
  private val ApiFetch = 1
  private val ApiListOffsets = 2
  private val ApiMetadata = 3
  private val ApiOffsetCommit = 8
  private val ApiOffsetFetch = 9
  private val ApiFindCoordinator = 10
  private val ApiJoinGroup = 11
  private val ApiHeartbeat = 12
  private val ApiLeaveGroup = 13
  private val ApiSyncGroup = 14
  private val ApiDescribeGroups = 15
  private val ApiListGroups = 16
  private val ApiSaslHandshake = 17
  private val ApiVersions = 18
  private val ApiCreateTopics = 19
  private val ApiDeleteTopics = 20
  private val ApiInitProducerId = 22
  private val ApiAddPartitionsToTxn = 24
  private val ApiEndTxn = 26
  private val ApiSaslAuthenticate = 36

  // ── primitive codecs ────────────────────────────────────────────────

  /** Growable big-endian writer with position-patching (batch length
    * and CRC are back-filled after the payload is known).
    */
  final class Buf(initial: Int = 256) {
    private var arr = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, len + n))
      }
    def size: Int = len
    def i8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def i16(v: Int): Unit = { ensure(2)
      arr(len) = (v >> 8).toByte; arr(len + 1) = v.toByte; len += 2 }
    def i32(v: Int): Unit = { ensure(4)
      arr(len) = (v >> 24).toByte; arr(len + 1) = (v >> 16).toByte
      arr(len + 2) = (v >> 8).toByte; arr(len + 3) = v.toByte; len += 4 }
    def i64(v: Long): Unit = { i32((v >> 32).toInt); i32(v.toInt) }
    def putI32At(pos: Int, v: Int): Unit = {
      arr(pos) = (v >> 24).toByte; arr(pos + 1) = (v >> 16).toByte
      arr(pos + 2) = (v >> 8).toByte; arr(pos + 3) = v.toByte }
    def raw(b: Array[Byte]): Unit = { ensure(b.length)
      System.arraycopy(b, 0, arr, len, b.length); len += b.length }
    def str(s: String): Unit = { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    def nstr(s: String): Unit = if (s == null) i16(-1) else str(s)
    def bytes(b: Array[Byte]): Unit = { i32(b.length); raw(b) }
    def nbytes(b: Array[Byte]): Unit = if (b == null) i32(-1) else bytes(b)
    /** Zigzag varint (the record-framing integer). */
    def varint(v: Int): Unit = uvarint(((v << 1) ^ (v >> 31)).toLong & 0xffffffffL)
    def varlong(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    private def uvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { i8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      i8(v.toInt)
    }
    def array[T](xs: Seq[T])(f: T => Unit): Unit = { i32(xs.size); xs.foreach(f) }
    // ── flexible-version (KIP-482) primitives: compact strings/arrays
    //    are length+1 as UNSIGNED varints; tagged-field blocks close
    //    every flexible struct ──────────────────────────────────────────
    def uv(v: Int): Unit = uvarint(v.toLong & 0xffffffffL)
    def cstr(s: String): Unit = { val b = s.getBytes(UTF_8); uv(b.length + 1); raw(b) }
    def cnstr(s: String): Unit = if (s == null) uv(0) else cstr(s)
    def cbytes(b: Array[Byte]): Unit = { uv(b.length + 1); raw(b) }
    def cnbytes(b: Array[Byte]): Unit = if (b == null) uv(0) else cbytes(b)
    def carray[T](xs: Seq[T])(f: T => Unit): Unit = { uv(xs.size + 1); xs.foreach(f) }
    def cnarrayNull(): Unit = uv(0)
    def tags(): Unit = uv(0)
    def uuid(hi: Long, lo: Long): Unit = { i64(hi); i64(lo) }
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, len)
    /** CRC32C over [from, size) — the batch checksum input. */
    def crc32c(from: Int): Int = {
      val c = new CRC32C
      c.update(arr, from, len - from)
      c.getValue.toInt
    }
  }

  /** Big-endian reader over a frame. */
  final class Rd(buf: Array[Byte], from: Int = 0, until: Int = -1) {
    private val bb = ByteBuffer.wrap(buf, from,
      (if (until < 0) buf.length else until) - from)
    def remaining: Int = bb.remaining
    def pos: Int = bb.position()
    def i8(): Byte = bb.get()
    def i16(): Short = bb.getShort()
    def i32(): Int = bb.getInt()
    def i64(): Long = bb.getLong()
    def u32(): Long = bb.getInt().toLong & 0xffffffffL
    def raw(n: Int): Array[Byte] = { val b = new Array[Byte](n); bb.get(b); b }
    def skip(n: Int): Unit = { bb.position(bb.position() + n); () }
    def str(): String = new String(raw(i16().toInt), UTF_8)
    def nstr(): String = { val n = i16().toInt; if (n < 0) null else new String(raw(n), UTF_8) }
    def bytes(): Array[Byte] = raw(i32())
    def nbytes(): Array[Byte] = { val n = i32(); if (n < 0) null else raw(n) }
    def varint(): Int = { val u = uvarint(); ((u >>> 1) ^ -(u & 1)).toInt }
    def varlong(): Long = { val u = uvarint(); (u >>> 1) ^ -(u & 1) }
    private def uvarint(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = bb.get() & 0xff; v |= (b & 0x7fL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      v
    }
    def array[T](f: => T): Seq[T] = { val n = i32(); (0 until n).map(_ => f) }
    def narray[T](f: => T): Seq[T] = {
      val n = i32(); if (n < 0) null else (0 until n).map(_ => f)
    }
    // flexible-version (KIP-482) primitives — see Buf
    def uv(): Int = uvarint().toInt
    def cstr(): String = { val n = uv() - 1
      if (n < 0) null else new String(raw(n), UTF_8) }
    def cbytes(): Array[Byte] = { val n = uv() - 1; if (n < 0) null else raw(n) }
    def carray[T](f: => T): Seq[T] = { val n = uv() - 1
      if (n < 0) null else (0 until n).map(_ => f) }
    def tags(): Unit = {
      val n = uv()
      var i = 0
      while (i < n) { uv(); val sz = uv(); skip(sz); i += 1 }
    }
    def uuid(): (Long, Long) = (i64(), i64())
  }

  // ── record batch v2 (magic 2) ───────────────────────────────────────

  /** Compression codec ids (attributes bits 0-2, protocol enum). */
  val CodecNone = 0
  val CodecGzip = 1
  val CodecSnappy = 2
  val CodecLz4 = 3
  val CodecZstd = 4

  def codecId(name: String): Int = name match {
    case "none" | "" => CodecNone
    case "gzip" => CodecGzip
    case "snappy" => CodecSnappy
    case "lz4" => CodecLz4
    case "zstd" => CodecZstd
    case other => throw new IllegalArgumentException(
      s"unknown compression codec: $other")
  }

  /** Compress a magic-2 records block with the EXACT framing real Kafka
    * clients use per codec: gzip = RFC 1952 stream, snappy = xerial
    * stream framing (SnappyOutputStream), lz4 = LZ4 Frame format,
    * zstd = standard zstd frames.
    */
  private def compress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case CodecNone => data
    case _ =>
      val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val os: java.io.OutputStream = codec match {
        case CodecGzip => new java.util.zip.GZIPOutputStream(bos)
        case CodecSnappy => new org.xerial.snappy.SnappyOutputStream(bos)
        case CodecLz4 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        case CodecZstd => new com.github.luben.zstd.ZstdOutputStream(bos)
        case c => throw new IllegalArgumentException(s"codec $c")
      }
      os.write(data); os.close()
      bos.toByteArray
  }

  private def decompress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case CodecNone => data
    case _ =>
      val bis = new java.io.ByteArrayInputStream(data)
      val is: java.io.InputStream = codec match {
        case CodecGzip => new java.util.zip.GZIPInputStream(bis)
        case CodecSnappy => new org.xerial.snappy.SnappyInputStream(bis)
        case CodecLz4 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
        case CodecZstd => new com.github.luben.zstd.ZstdInputStream(bis)
        case c => throw new IllegalArgumentException(s"codec $c")
      }
      try is.readAllBytes() finally is.close()
  }

  /** Encode records (offset-assigned [[Broker.Stored]]) as ONE magic-2
    * batch. CRC32C covers attributes..end, back-filled like a real
    * producer does. With a codec, the records block AFTER the
    * recordsCount field is compressed (the batch header, including the
    * count, stays plain — the protocol's layout), and the CRC covers
    * the compressed bytes as they go on the wire.
    */
  def encodeBatch(records: Seq[Broker.Stored],
                  codec: Int = CodecNone,
                  producerId: Long = -1L,
                  producerEpoch: Short = -1,
                  baseSequence: Int = -1,
                  attrsExtra: Int = 0): Array[Byte] = {
    require(records.nonEmpty, "empty batch")
    val base = records.head.offset
    val baseTs = records.map(_.timestampMs).min
    val maxTs = records.map(_.timestampMs).max
    val b = new Buf(512)
    b.i64(base)
    val lenPos = b.size; b.i32(0)          // batchLength (patched)
    b.i32(-1)                              // partitionLeaderEpoch
    b.i8(2)                                // magic
    val crcPos = b.size; b.i32(0)          // crc (patched)
    val crcFrom = b.size
    // attributes: compression bits 0-2; bit 4 = transactional, bit 5 =
    // control (attrsExtra — the transaction-marker encoder sets both)
    b.i16(((codec & 7) | attrsExtra).toShort)
    b.i32((records.last.offset - base).toInt) // lastOffsetDelta
    b.i64(baseTs)
    b.i64(maxTs)
    b.i64(producerId)
    b.i16(producerEpoch)
    b.i32(baseSequence)
    b.i32(records.size)
    val recBuf = new Buf(256)
    records.foreach { r =>
      val body = new Buf(64)
      body.i8(0)                           // record attributes
      body.varlong(r.timestampMs - baseTs)
      body.varint((r.offset - base).toInt)
      if (r.key == null) body.varint(-1)
      else { body.varint(r.key.length); body.raw(r.key) }
      if (r.value == null) body.varint(-1)
      else { body.varint(r.value.length); body.raw(r.value) }
      body.varint(r.headers.size)
      r.headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val kb = k.getBytes(UTF_8); body.varint(kb.length); body.raw(kb)
        if (v == null) body.varint(-1)
        else { val vb = v.getBytes(UTF_8); body.varint(vb.length); body.raw(vb) }
      }
      val bodyBytes = body.result
      recBuf.varint(bodyBytes.length)
      recBuf.raw(bodyBytes)
    }
    b.raw(compress(codec, recBuf.result))
    b.putI32At(lenPos, b.size - lenPos - 4)
    b.putI32At(crcPos, b.crc32c(crcFrom))
    b.result
  }

  /** Decode a record-set (one or more concatenated batches).
    * `assignOffsets(base)`: a broker decoding a produce re-assigns
    * offsets from its log end; a consumer decoding a fetch keeps the
    * wire offsets (pass None). CRC is verified either way.
    */
  def decodeBatches(buf: Array[Byte], partition: Int,
                    assignFrom: Option[Long]): Seq[Broker.Stored] = {
    val out = ArrayBuffer.empty[Broker.Stored]
    var pos = 0
    var nextAssigned = assignFrom.getOrElse(0L)
    while (pos + 12 <= buf.length) {
      val hdr = new Rd(buf, pos)
      val baseOffset = hdr.i64()
      val batchLen = hdr.i32()
      if (pos + 12 + batchLen > buf.length) { pos = buf.length } // truncated tail
      else {
        val r = new Rd(buf, pos + 12, pos + 12 + batchLen)
        r.skip(4) // partitionLeaderEpoch
        val magic = r.i8()
        require(magic == 2, s"unsupported magic $magic")
        val crc = r.u32()
        val crcFrom = r.pos - (pos + 12) // body-relative: after epoch+magic+crc
        val check = new CRC32C
        check.update(buf, pos + 12 + crcFrom, batchLen - crcFrom)
        if (check.getValue != crc)
          throw new CorruptBatch(s"crc mismatch: wire=$crc computed=${check.getValue}")
        val attrs = r.i16()
        val codec = attrs & 7 // attributes: compression bits 0-2
        r.skip(4) // lastOffsetDelta
        val baseTs = r.i64()
        r.skip(8) // maxTimestamp
        r.skip(8 + 2 + 4) // producerId, producerEpoch, baseSequence
        val count = r.i32()
        // control batches (bit 5: transaction commit/abort markers)
        // occupy offsets but never surface as records — consume their
        // offset range and move on, like every real consumer
        if ((attrs & 0x20) != 0) {
          nextAssigned += count
          pos += 12 + batchLen
        } else {
        // the records block (everything after recordsCount) is what a
        // producer compressed; decompress it and parse from the plain form
        val rr = if (codec == CodecNone) r
                 else new Rd(decompress(codec, r.raw(r.remaining)))
        var i = 0
        while (i < count) {
          val recLen = rr.varint()
          val end = rr.pos + recLen
          rr.skip(1) // record attributes
          val tsDelta = rr.varlong()
          val offDelta = rr.varint()
          val kLen = rr.varint()
          val key = if (kLen < 0) null else rr.raw(kLen)
          val vLen = rr.varint()
          val value = if (vLen < 0) null else rr.raw(vLen)
          val hCount = rr.varint()
          val headers = (0 until hCount).map { _ =>
            val hk = new String(rr.raw(rr.varint()), UTF_8)
            val hvLen = rr.varint()
            val hv = if (hvLen < 0) null else new String(rr.raw(hvLen), UTF_8)
            hk -> hv
          }.toMap
          require(rr.pos == end, s"record framing drift: ${rr.pos} vs $end")
          val off = assignFrom match {
            case Some(_) => val o = nextAssigned; nextAssigned += 1; o
            case None => baseOffset + offDelta
          }
          out += Broker.Stored(partition, off, key, value, headers,
            baseTs + tsDelta)
          i += 1
        }
        pos += 12 + batchLen
        }
      }
    }
    out.toVector
  }

  /** Versions from which each implemented api speaks the flexible
    * (KIP-482) encoding: compact strings/arrays, tagged-field blocks,
    * request header v2 / response header v1.
    */
  private def flexibleVersion(api: Int, ver: Int): Boolean = api match {
    case ApiProduce => ver >= 9
    case ApiFetch => ver >= 12
    case ApiMetadata => ver >= 9
    case ApiVersions => ver >= 3
    case ApiListOffsets => ver >= 6
    case ApiFindCoordinator => ver >= 3
    case ApiOffsetFetch => ver >= 6
    case ApiJoinGroup => ver >= 6
    case ApiSyncGroup => ver >= 4
    case ApiHeartbeat => ver >= 4
    case ApiLeaveGroup => ver >= 4
    case ApiOffsetCommit => ver >= 8
    case ApiInitProducerId => ver >= 2
    case ApiListGroups => ver >= 3
    case ApiDescribeGroups => ver >= 5
    case ApiDeleteTopics => ver >= 4
    case ApiSaslAuthenticate => ver >= 2
    case ApiAddPartitionsToTxn => ver >= 3
    case ApiEndTxn => ver >= 3
    case _ => false // SaslHandshake is never flexible
  }

  /** Deterministic topic id (KIP-516): md5(name) as the 16-byte uuid —
    * stable across restarts of the loopback broker, which is all the
    * fetch-by-id path needs.
    */
  def topicUuid(name: String): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes(UTF_8))
    val bb = ByteBuffer.wrap(d)
    (bb.getLong, bb.getLong)
  }

  final class CorruptBatch(msg: String) extends RuntimeException(msg)
  final class WireError(val code: Short, msg: String)
    extends RuntimeException(s"kafka error $code: $msg")

  /** SCRAM-SHA-256 primitives (RFC 5802 / RFC 7677) — the mechanism
    * real Kafka deployments default to for password auth. The server
    * stores only the DERIVED credentials (salt, iteration count,
    * StoredKey, ServerKey), exactly what a real broker keeps in
    * ZooKeeper/KRaft — the plaintext never participates in a handshake.
    */
  object Scram {
    import javax.crypto.{Mac, SecretKeyFactory}
    import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
    final case class Credentials(salt: Array[Byte], iterations: Int,
                                 storedKey: Array[Byte],
                                 serverKey: Array[Byte])
    private val rnd = new java.security.SecureRandom()
    def nonce(): String = {
      val b = new Array[Byte](18); rnd.nextBytes(b)
      java.util.Base64.getEncoder.encodeToString(b)
    }
    def b64(b: Array[Byte]): String =
      java.util.Base64.getEncoder.encodeToString(b)
    def unb64(s: String): Array[Byte] =
      java.util.Base64.getDecoder.decode(s)
    def hmac(key: Array[Byte], msg: String): Array[Byte] = {
      val m = Mac.getInstance("HmacSHA256")
      m.init(new SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(msg.getBytes(UTF_8))
    }
    def sha256(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
    def saltedPassword(password: String, salt: Array[Byte],
                       iterations: Int): Array[Byte] =
      SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(
          new PBEKeySpec(password.toCharArray, salt, iterations, 256))
        .getEncoded
    def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key")
    def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key")
    def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      a.zip(b).map { case (x, y) => (x ^ y).toByte }
    def derive(password: String, iterations: Int = 4096): Credentials = {
      val salt = new Array[Byte](16); rnd.nextBytes(salt)
      val sp = saltedPassword(password, salt, iterations)
      Credentials(salt, iterations, sha256(clientKey(sp)), serverKey(sp))
    }
  }

  // ── server ──────────────────────────────────────────────────────────

  /** One wire record-batch as scanned by [[scanBatchHeaders]]:
    * `pos`/`len` span the batch INCLUDING its 12-byte preamble.
    * `producerId`/`producerEpoch`/`baseSeq` are the idempotent-producer
    * fields of the v2 batch header (-1/-1/-1 for a non-idempotent
    * producer).
    */
  final case class BatchInfo(pos: Int, len: Int, base: Long, count: Int,
                             producerId: Long = -1L,
                             producerEpoch: Short = -1,
                             baseSeq: Int = -1,
                             attrs: Short = 0) {
    def isTransactional: Boolean = (attrs & 0x10) != 0
    def isControl: Boolean = (attrs & 0x20) != 0
  }

  /** Header-only walk of a record set: validates magic + CRC per batch
    * and returns (position, length, baseOffset, recordCount) without
    * parsing any record bodies — the broker's produce hot path.
    */
  def scanBatchHeaders(buf: Array[Byte]): Seq[BatchInfo] = {
    val out = ArrayBuffer.empty[BatchInfo]
    var pos = 0
    while (pos + 12 <= buf.length) {
      val hdr = new Rd(buf, pos)
      val base = hdr.i64()
      val batchLen = hdr.i32()
      if (pos + 12 + batchLen > buf.length) { pos = buf.length } // truncated
      else {
        val r = new Rd(buf, pos + 12, pos + 12 + batchLen)
        r.skip(4) // partitionLeaderEpoch
        val magic = r.i8()
        if (magic != 2) throw new CorruptBatch(s"unsupported magic $magic")
        val crc = r.u32()
        val crcFrom = r.pos - (pos + 12)
        val check = new CRC32C
        check.update(buf, pos + 12 + crcFrom, batchLen - crcFrom)
        if (check.getValue != crc)
          throw new CorruptBatch(
            s"crc mismatch: wire=$crc computed=${check.getValue}")
        val attrs = r.i16()
        r.skip(4 + 8 + 8) // lastOffsetDelta, baseTs, maxTs
        val pid = r.i64()
        val pEpoch = r.i16()
        val baseSeq = r.i32()
        val count = r.i32()
        if (count < 0) throw new CorruptBatch(s"negative record count $count")
        out += BatchInfo(pos, 12 + batchLen, base, count, pid, pEpoch,
          baseSeq, attrs)
        pos += 12 + batchLen
      }
    }
    out.toSeq
  }

  /** The log stores WIRE BATCHES, not rows — like a real broker. A
    * produced batch is CRC-validated, RE-BASED by patching the 8-byte
    * baseOffset (which sits OUTSIDE the CRC region, so the producer's
    * checksum stays valid — the same property real brokers exploit for
    * zero-copy), and kept verbatim; record-level views decode lazily
    * and are cached. Fetches at a batch boundary serve the stored bytes
    * with no re-encode — the batch-passthrough path that makes
    * broker→broker migration memcpy-bound instead of codec-bound.
    */
  private final class PartitionLog(partition: Int) {
    private final class Entry(val base: Long, val count: Int,
                              val bytes: Array[Byte],
                              preParsed: Vector[Broker.Stored],
                              val producerId: Long = -1L) {
      // set ONCE by the abort marker's endTxn; read by committedOnly
      // slices after an unsynchronized snapshot, hence volatile
      @volatile var aborted: Boolean = false
      lazy val records: Vector[Broker.Stored] =
        if (preParsed != null) preParsed
        else decodeBatches(bytes, partition, assignFrom = None).toVector
    }
    private val entries = ArrayBuffer.empty[Entry]
    private var endOff = 0L

    // ── idempotent-producer state (KIP-98): per producer id, the
    // current epoch on this partition, the next expected sequence and
    // the last ≤5 appended batches (the protocol's dedup window — a
    // retried batch whose (firstSeq,lastSeq) matches a cached entry is
    // acked with its ORIGINAL base offset instead of re-appended) ──────
    private final class ProducerSlot {
      var epoch: Short = -1
      var nextSeq: Int = 0
      val recent = mutable.ArrayDeque.empty[(Int, Int, Long)]
    }
    private val producers = mutable.Map.empty[Long, ProducerSlot]
    /** Sequences are int31 and wrap (KIP-98). */
    private def seqAdd(seq: Int, n: Int): Int =
      ((seq.toLong + n) % 0x80000000L).toInt

    // ── transaction state (KIP-98 EOS, the read_committed side):
    // open txns by producer id → first offset of the txn on this
    // partition. Aborted transactions are NOT kept as ranges: the
    // abort marker's endTxn flags the txn's own entries in place
    // (O(txn span), once), so read_committed fetch cost is flat in
    // the number of past aborts and broker txn state never grows.
    // A partition that never sees a transactional batch keeps this
    // empty — the raw-passthrough fetch fast path stays untouched. ──
    private val openTxns = mutable.Map.empty[Long, Long]
    private var hadAborts = false
    def hasTxnState: Boolean =
      synchronized(openTxns.nonEmpty || hadAborts)
    /** An open (unmarked) txn for this pid — the expiry sweep re-checks
      * this after writing markers to catch a racing produce. */
    def hasOpenTxn(pid: Long): Boolean = synchronized(openTxns.contains(pid))
    /** Last stable offset: everything below is decided. */
    def lso: Long = synchronized(
      if (openTxns.isEmpty) endOff else openTxns.values.min)

    /** Write the transaction marker (a CONTROL batch — attribute bits
      * 4+5, one record whose key is [version=0, type] and whose value
      * is [version=0, coordinator_epoch=0]) and close the txn's range.
      * No-op when this partition has no open txn for the pid.
      */
    def endTxn(pid: Long, epoch: Short, commit: Boolean): Unit =
      synchronized {
        openTxns.remove(pid).foreach { first =>
          if (!commit) {
            hadAborts = true
            // flag the txn's own batches in [first, endOff): a pid's
            // txns are sequential, so everything of this pid at or
            // above `first` belongs to the txn being aborted;
            // interleaved OTHER-pid batches stay visible
            var lo = 0; var hi = entries.length - 1; var i = entries.length
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (entries(mid).base >= first) { i = mid; hi = mid - 1 }
              else lo = mid + 1
            }
            while (i < entries.length) {
              val e = entries(i)
              if (e.producerId == pid) e.aborted = true
              i += 1
            }
          }
          val key = ByteBuffer.allocate(4)
            .putShort(0).putShort(if (commit) 1 else 0).array()
          val value = ByteBuffer.allocate(6).putShort(0).putInt(0).array()
          val marker = encodeBatch(
            Seq(Broker.Stored(partition, endOff, key, value, Map.empty, 0L)),
            CodecNone, pid, epoch, -1, attrsExtra = 0x30)
          // control records occupy an offset but never surface: the
          // record-level view is pinned empty
          entries += new Entry(endOff, 1, marker, Vector.empty, pid)
          endOff += 1
        }
      }

    /** Validate one producer batch against this partition's state.
      * Left(base) = exact duplicate of a cached batch (ack `base`,
      * skip the append); Right(slot) = in-order append allowed — the
      * caller records (firstSeq,lastSeq,base) after appending. Throws
      * [[WireError]] for fenced epochs and sequence gaps.
      */
    private def producerCheck(b: BatchInfo,
                              curEpoch: Short): Either[Long, ProducerSlot] = {
      val slot = producers.getOrElseUpdate(b.producerId, new ProducerSlot)
      if (b.producerEpoch < curEpoch)
        throw new WireError(ErrInvalidProducerEpoch,
          s"producer ${b.producerId} epoch ${b.producerEpoch} fenced by $curEpoch")
      if (b.producerEpoch < slot.epoch)
        throw new WireError(ErrInvalidProducerEpoch,
          s"producer ${b.producerId} epoch ${b.producerEpoch} fenced by ${slot.epoch}")
      if (b.producerEpoch > slot.epoch) {
        // first batch of a new epoch: sequences restart at 0 (KIP-360)
        if (b.baseSeq != 0)
          throw new WireError(ErrOutOfOrderSequence,
            s"producer ${b.producerId} epoch ${b.producerEpoch}: first batch " +
            s"must carry sequence 0, got ${b.baseSeq}")
        slot.epoch = b.producerEpoch
        slot.nextSeq = 0
        slot.recent.clear()
      }
      val lastSeq = seqAdd(b.baseSeq, b.count - 1)
      slot.recent.collectFirst {
        case (f, l, base) if f == b.baseSeq && l == lastSeq => base
      } match {
        case Some(base) => Left(base) // duplicate retry: ack original offset
        case None =>
          if (b.baseSeq != slot.nextSeq)
            throw new WireError(ErrOutOfOrderSequence,
              s"producer ${b.producerId}: sequence ${b.baseSeq} out of order " +
              s"(expected ${slot.nextSeq})")
          Right(slot)
      }
    }

    def end: Long = synchronized(endOff)

    def append(batch: Seq[Broker.Stored]): Long = synchronized {
      val base = endOff
      val rebased = batch.zipWithIndex
        .map { case (r, i) => r.copy(offset = base + i) }.toVector
      entries += new Entry(base, rebased.size,
        encodeBatch(rebased, CodecNone), rebased)
      endOff += rebased.size
      base
    }

    /** Append producer wire batches verbatim (CRC-checked, re-based).
      * `epochOf` is the broker's InitProducerId registry: a batch whose
      * producer id is REGISTERED there goes through the idempotence
      * checks (epoch fencing, duplicate dedup, in-order sequences); an
      * unregistered id appends verbatim — on a single-node broker with
      * no pid expiry that can only be a MIRRORED batch (the raw
      * passthrough keeps the source cluster's producer ids, and fencing
      * them against a registry they never joined would break
      * broker→broker migration).
      */
    def appendRaw(recordSet: Array[Byte],
                  epochOf: Long => Option[Short] = _ => None): Long = {
      val scanned = scanBatchHeaders(recordSet) // validate OUTSIDE the lock
      synchronized {
        var first = -1L
        scanned.foreach { b =>
          val verdict: Either[Long, ProducerSlot] =
            if (b.producerId >= 0L) epochOf(b.producerId) match {
              case Some(cur) => producerCheck(b, cur)
              case None => Right(null)
            } else Right(null)
          verdict match {
            case Left(dupBase) =>
              if (first < 0) first = dupBase
            case Right(slot) =>
              val bytes = java.util.Arrays.copyOfRange(
                recordSet, b.pos, b.pos + b.len)
              // patch baseOffset (bytes 0-7, big-endian) to the assigned base
              var v = endOff; var i = 7
              while (i >= 0) { bytes(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
              entries += new Entry(endOff, b.count, bytes, null, b.producerId)
              // a transactional data batch opens (or extends) its pid's
              // txn on this partition — the LSO holds below it until
              // EndTxn writes the marker
              if (b.isTransactional && !b.isControl && b.producerId >= 0L) {
                openTxns.getOrElseUpdate(b.producerId, endOff); ()
              }
              if (slot != null) {
                val lastSeq = seqAdd(b.baseSeq, b.count - 1)
                slot.recent.append((b.baseSeq, lastSeq, endOff))
                while (slot.recent.size > 5) slot.recent.removeHead()
                slot.nextSeq = seqAdd(lastSeq, 1)
              }
              if (first < 0) first = endOff
              endOff += b.count
          }
        }
        if (first < 0) first = endOff
        first
      }
    }

    /** Record-level read. `until` bounds the scan (the read_committed
      * path passes the LSO); `committedOnly` additionally drops whole
      * batches whose transaction aborted (batch granularity is exact —
      * a txn only ever contains its own pid's batches, and interleaved
      * OTHER-pid batches stay visible; the abort marker flagged the
      * txn's entries at write time).
      */
    def slice(from: Long, limit: Int, until: Long = Long.MaxValue,
              committedOnly: Boolean = false): Vector[Broker.Stored] = {
      val (snapshot, hw) = synchronized((entries.toVector, endOff))
      if (from >= hw || from >= until) return Vector.empty
      val start = math.max(0, {
        var lo = 0; var hi = snapshot.length - 1; var ans = 0
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (snapshot(mid).base <= from) { ans = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        ans
      })
      val out = Vector.newBuilder[Broker.Stored]
      var n = 0
      var i = start
      while (i < snapshot.length && n < limit &&
             snapshot(i).base < until) {
        val e = snapshot(i)
        // O(1) per batch regardless of how many aborts the log has
        // seen: the abort marker flagged its txn's entries at write
        // time, so no range list is consulted (or even kept)
        val dropAborted = committedOnly && e.aborted
        if (!dropAborted) e.records.foreach { r =>
          if (r.offset >= from && r.offset < until && n < limit) {
            out += r; n += 1
          }
        }
        i += 1
      }
      out.result()
    }

    /** Raw passthrough: when `from` is exactly a batch boundary, the
      * stored wire bytes of consecutive batches (≥1, up to ~maxRecs
      * records) are served verbatim. Mid-batch offsets fall back to the
      * record-level path (None).
      */
    def rawSlice(from: Long, maxRecs: Int): Option[Array[Byte]] = {
      val snapshot = synchronized(entries.toVector)
      val i0 = {
        var lo = 0; var hi = snapshot.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (snapshot(mid).base <= from) { ans = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        ans
      }
      if (i0 < 0 || snapshot(i0).base != from) return None
      var total = 0; var n = 0; var i = i0
      while (i < snapshot.length &&
             (n == 0 || n + snapshot(i).count <= maxRecs)) {
        total += snapshot(i).bytes.length
        n += snapshot(i).count
        i += 1
      }
      val out = new Array[Byte](total)
      var pos = 0; var j = i0
      while (j < i) {
        System.arraycopy(snapshot(j).bytes, 0, out, pos,
          snapshot(j).bytes.length)
        pos += snapshot(j).bytes.length
        j += 1
      }
      Some(out)
    }
  }

  private final class Group {
    var generation = 0
    var leader: String = null
    var state: String = "Empty" // Empty | Joining | AwaitSync | Stable
    val members = LinkedHashMap.empty[String, Array[Byte]]  // current gen
    val joiners = LinkedHashMap.empty[String, Array[Byte]]  // pending gen
    var expected: Set[String] = Set.empty                   // prev-gen members
    var joinDeadline = 0L
    var assignments = Map.empty[String, Array[Byte]]
    val committed = mutable.Map.empty[(String, Int), Long]
    val memberSeq = new AtomicInteger(0)
    // selected at join completion; echoed by JoinGroup v7+ / SyncGroup
    // v5+ responses (KIP-559 — clients cross-check the group's protocol)
    var protocolType: String = "consumer"
    var protocolName: String = "range"
  }

  /** Loopback Kafka broker: real frames in, real frames out, CRC
    * validated on produce. Single node (node id 1) — it is its own
    * controller and every group's coordinator, which is exactly what a
    * one-broker cluster reports via Metadata/FindCoordinator.
    */
  final class Server(joinDelayMs: Long = 150L,
                     maxFetchRecords: Int = 500,
                     fetchCodec: Int = CodecNone,
                     saslUsers: Map[String, String] = Map.empty,
                     // seam clock (the CloudQueue/Memcached convention):
                     // txn-expiry specs advance it instead of sleeping
                     clock: () => Long = () => System.currentTimeMillis(),
                     // pin the listen port so a config's verbatim
                     // `addresses: [localhost:9092]` resolves
                     // (config/examples/aws_cloudwatch_logs.yaml);
                     // default stays an ephemeral port
                     bindPort: Int = 0) {
    private val topics = TrieMap.empty[String, Array[PartitionLog]]
    private val groups = TrieMap.empty[String, Group]
    // ── idempotent-producer registry (InitProducerId): pid → current
    // epoch. A re-init for the same transactional id or the same pid
    // (KIP-360) bumps the epoch, fencing every older-epoch producer ──
    private val producerEpochs = TrieMap.empty[Long, Short]
    private val txnProducers = TrieMap.empty[String, Long]
    private val nextProducerId = new AtomicLong(1L)
    // partitions each producer id has added to its current transaction
    // (AddPartitionsToTxn) — EndTxn writes markers to exactly these
    private val txnPartitions = TrieMap.empty[Long, Set[(String, Int)]]
    // transaction.timeout.ms (KIP-98): InitProducerId's requested
    // timeout per pid, and when each pid's current transaction was
    // last extended. A transaction idle past its timeout is aborted
    // BROKER-side — markers written, LSO released — and the pid's
    // epoch is bumped so the stale producer is fenced on its next
    // request, exactly the real coordinator's expiry path. This is
    // what keeps open-txn state bounded on a long-lived broker.
    private val txnTimeoutMs = TrieMap.empty[Long, Int]
    private val txnTouchedAtMs = TrieMap.empty[Long, Long]

    private def expireStaleTxns(): Unit = {
      if (txnTouchedAtMs.isEmpty) return
      val now = clock()
      txnTouchedAtMs.foreach { case (pid, t0) =>
        if (now - t0 > txnTimeoutMs.getOrElse(pid, 60000).toLong &&
            txnTouchedAtMs.remove(pid).isDefined) {
          val epoch = producerEpochs.updateWith(pid) {
            case Some(e) => Some((e + 1).toShort)
            case None => Some(0: Short)
          }.get
          val touched = txnPartitions.remove(pid).getOrElse(Set.empty)
          touched.foreach {
            case (t, p) => topics.get(t).flatMap(_.lift(p))
              .foreach(_.endTxn(pid, epoch, commit = false))
          }
          // a produce that passed the OLD epoch check concurrently may
          // append after the markers, reopening the txn on a pid whose
          // timeout entry is gone — the LSO would pin until the
          // producer retried. Re-arm such a pid so the NEXT sweep
          // aborts the reopened txn with the bumped epoch.
          val reopened = touched.filter { case (t, p) =>
            topics.get(t).flatMap(_.lift(p)).exists(_.hasOpenTxn(pid))
          }
          if (reopened.nonEmpty) {
            txnPartitions.update(pid, reopened)
            txnTouchedAtMs.put(pid, now -
              txnTimeoutMs.getOrElse(pid, 60000).toLong - 1)
            ()
          }
        }
      }
    }
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", bindPort))
    val port: Int = server.getLocalPort
    private val running = new AtomicBoolean(true)
    private val conns = TrieMap.empty[Socket, Unit]

    private val acceptor = new Thread(() => {
      while (running.get) {
        try {
          val sock = server.accept()
          conns.put(sock, ())
          val t = new Thread(() => handle(sock), s"kafka-wire-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Throwable => () }
      }
    }, "kafka-wire-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    def stop(): Unit = {
      running.set(false)
      try server.close() catch { case _: Throwable => () }
      conns.keys.foreach(s => try s.close() catch { case _: Throwable => () })
    }

    /** Admin convenience for tests/gates (a real deployment would use
      * CreateTopics over the wire — the server handles both).
      */
    def createTopic(topic: String, partitions: Int): Unit = {
      topics.putIfAbsent(topic,
        Array.tabulate(partitions)(new PartitionLog(_)))
      ()
    }

    private def handle(sock: Socket): Unit = {
      try {
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        // SASL is per-CONNECTION state, so it lives here rather than in
        // the stateless dispatch table: a broker with saslUsers answers
        // only ApiVersions + the SASL handshake pair until the
        // connection authenticates, then behaves normally. The
        // handshake SELECTS the mechanism; SCRAM additionally carries a
        // multi-round session.
        var authed = saslUsers.isEmpty
        var saslMechanism: String = null
        var scram: ScramSession = null
        while (running.get) {
          val size = in.readInt()
          val frame = new Array[Byte](size)
          in.readFully(frame)
          val r = new Rd(frame)
          val apiKey = r.i16().toInt
          val apiVersion = r.i16().toInt
          val correlationId = r.i32()
          r.nstr() // client_id (non-compact in EVERY request header version)
          // request header v2 (flexible apis) appends tagged fields
          if (flexibleVersion(apiKey, apiVersion)) r.tags()
          val body = new Buf(256)
          body.i32(correlationId)
          // response header v1 = correlation + tags — for every flexible
          // api EXCEPT ApiVersions, which keeps header v0 so old clients
          // can always parse the version-negotiation response
          if (flexibleVersion(apiKey, apiVersion) && apiKey != ApiVersions)
            body.tags()
          apiKey match {
            case ApiSaslHandshake =>
              saslMechanism = handleSaslHandshake(apiVersion, r, body)
              scram = null
            case ApiSaslAuthenticate if saslMechanism == "SCRAM-SHA-256" =>
              val (done, next) = handleSaslScram(apiVersion, r, body, scram)
              scram = next
              authed |= done
            case ApiSaslAuthenticate =>
              authed |= handleSaslAuthenticate(apiVersion, r, body)
            case ApiVersions => dispatch(apiKey, apiVersion, r, body)
            case _ if !authed =>
              // real SASL listeners kill unauthenticated connections
              throw new EOFException("unauthenticated request")
            case _ => dispatch(apiKey, apiVersion, r, body)
          }
          val resp = body.result
          out.writeInt(resp.length)
          out.write(resp)
          out.flush()
        }
      } catch {
        case _: EOFException | _: java.net.SocketException => ()
        case _: Throwable => ()
      } finally {
        conns.remove(sock)
        try sock.close() catch { case _: Throwable => () }
      }
    }

    // dispatch is the per-request hot path: it stays a thin jump
    // table because HotSpot refuses to JIT-compile methods past the
    // ~8 KB bytecode HugeMethodLimit — inlining the handler bodies
    // here measurably de-optimized produce/fetch (migrate throughput
    // dropped ~25% when r15 first grew this method; same lesson as
    // WasmInterp.exec)
    private def dispatch(api: Int, ver: Int, r: Rd, b: Buf): Unit = api match {
      case ApiVersions => handleApiVersions(ver, r, b)
      case ApiMetadata if ver >= 9 => handleMetadataFlex(ver, r, b)
      case ApiMetadata => handleMetadataLegacy(ver, r, b)
      case ApiCreateTopics => handleCreateTopics(ver, r, b)
      case ApiProduce if ver >= 9 => handleProduceFlex(ver, r, b)
      case ApiProduce => handleProduceLegacy(ver, r, b)
      case ApiFetch if ver >= 12 => handleFetchFlex(ver, r, b)
      case ApiFetch if ver >= 5 => handleFetchMid(ver, r, b)
      case ApiFetch => handleFetchV4(ver, r, b)
      case ApiListOffsets => handleListOffsets(ver, r, b)
      case ApiFindCoordinator => handleFindCoordinator(ver, r, b)
      case ApiJoinGroup => handleJoinGroup(ver, r, b)
      case ApiSyncGroup => handleSyncGroup(ver, r, b)
      case ApiHeartbeat => handleHeartbeat(ver, r, b)
      case ApiLeaveGroup => handleLeaveGroup(ver, r, b)
      case ApiOffsetCommit => handleOffsetCommit(ver, r, b)
      case ApiOffsetFetch => handleOffsetFetch(ver, r, b)
      case ApiInitProducerId => handleInitProducerId(ver, r, b)
      case ApiListGroups => handleListGroups(ver, r, b)
      case ApiDescribeGroups => handleDescribeGroups(ver, r, b)
      case ApiDeleteTopics => handleDeleteTopics(ver, r, b)
      case ApiAddPartitionsToTxn => handleAddPartitionsToTxn(ver, r, b)
      case ApiEndTxn => handleEndTxn(ver, r, b)
      case other =>
        throw new IllegalArgumentException(s"unsupported api key $other")
    }

    /** AddPartitionsToTxn v0–v3 (the pre-KIP-890 shape, flexible at
      * v3): register the partitions the producer's current transaction
      * will touch — EndTxn writes markers to exactly these. A stale
      * epoch is fenced here, before any data moves.
      */
    private def handleAddPartitionsToTxn(ver: Int, r: Rd, b: Buf): Unit = {
      expireStaleTxns()
      val flex = ver >= 3
      if (flex) r.cstr() else r.str() // transactional_id
      val pid = r.i64()
      val epoch = r.i16()
      val asked: Seq[(String, Seq[Int])] =
        if (flex) r.carray {
          val t = r.cstr(); val ps = r.carray(r.i32()); r.tags(); (t, ps)
        } else r.array { (r.str(), r.array(r.i32())) }
      if (flex) r.tags()
      val fenced = producerEpochs.get(pid) match {
        case Some(cur) => epoch < cur
        case None => true // unknown pid cannot transact
      }
      def partErr(t: String, p: Int): Short =
        if (fenced) ErrInvalidProducerEpoch
        else if (!topics.get(t).exists(_.isDefinedAt(p)))
          ErrUnknownTopicOrPartition
        else {
          txnPartitions.updateWith(pid) {
            case Some(s) => Some(s + ((t, p)))
            case None => Some(Set((t, p)))
          }
          txnTouchedAtMs.put(pid, clock())
          ErrNone
        }
      b.i32(0) // throttle
      if (flex) {
        b.carray(asked) { case (t, ps) =>
          b.cstr(t)
          b.carray(ps) { p => b.i32(p); b.i16(partErr(t, p)); b.tags() }
          b.tags()
        }
        b.tags()
      } else b.array(asked) { case (t, ps) =>
        b.str(t)
        b.array(ps) { p => b.i32(p); b.i16(partErr(t, p)) }
      }
    }

    /** EndTxn v0–v3 (flexible at v3): write the commit/abort marker (a
      * control batch) to every partition the transaction touched and
      * release the LSO there.
      */
    private def handleEndTxn(ver: Int, r: Rd, b: Buf): Unit = {
      expireStaleTxns()
      val flex = ver >= 3
      if (flex) r.cstr() else r.str() // transactional_id
      val pid = r.i64()
      val epoch = r.i16()
      val committed = r.i8() != 0
      if (flex) r.tags()
      val err: Short = producerEpochs.get(pid) match {
        case Some(cur) if epoch >= cur =>
          txnTouchedAtMs.remove(pid)
          txnPartitions.remove(pid).getOrElse(Set.empty).foreach {
            case (t, p) =>
              topics.get(t).flatMap(_.lift(p))
                .foreach(_.endTxn(pid, epoch, committed))
          }
          ErrNone
        case Some(_) => ErrInvalidProducerEpoch
        case None => ErrUnknownProducerId
      }
      b.i32(0) // throttle
      b.i16(err)
      if (flex) b.tags()
    }

    /** SaslHandshake v0–v1 (never flexible): the mechanism menu —
      * PLAIN (RFC 4616) and SCRAM-SHA-256 (RFC 7677), the two the
      * reference's `sasl` config block is most commonly set to.
      * Returns the selected mechanism (null if unsupported).
      */
    private val saslMechanisms = Seq("PLAIN", "SCRAM-SHA-256")
    private def handleSaslHandshake(ver: Int, r: Rd, b: Buf): String = {
      val mechanism = r.str()
      val ok = saslMechanisms.contains(mechanism)
      b.i16(if (ok) ErrNone else ErrUnsupportedSaslMechanism)
      b.array(saslMechanisms)(b.str)
      if (ok) mechanism else null
    }

    // SCRAM server credentials, derived ONCE per broker from the
    // configured users — the broker side never sees plaintext again
    private lazy val scramCreds: Map[String, Scram.Credentials] =
      saslUsers.map { case (u, p) => u -> Scram.derive(p) }

    /** One in-flight SCRAM exchange (client-first seen, client-final
      * pending): the pieces of the RFC 5802 AuthMessage.
      */
    private final class ScramSession(val user: String,
                                     val clientFirstBare: String,
                                     val serverFirst: String,
                                     val nonce: String)

    /** SCRAM-SHA-256 over SaslAuthenticate: round 1 answers the
      * server-first-message (salt + iterations + combined nonce),
      * round 2 verifies the client proof against StoredKey and answers
      * the server signature. Returns (authenticated, nextState).
      */
    private def handleSaslScram(ver: Int, r: Rd, b: Buf,
                                st: ScramSession): (Boolean, ScramSession) = {
      val flex = ver >= 2
      val auth = new String(if (flex) r.cbytes() else r.bytes(), UTF_8)
      if (flex) r.tags()
      def respond(err: Short, msg: String, bytes: Array[Byte]): Unit = {
        b.i16(err)
        if (flex) b.cnstr(msg) else b.nstr(msg)
        if (flex) b.cbytes(bytes) else b.bytes(bytes)
        if (ver >= 1) b.i64(0L)
        if (flex) b.tags()
      }
      def fail(msg: String): (Boolean, ScramSession) = {
        respond(ErrSaslAuthenticationFailed, msg, Array.empty[Byte])
        (false, null)
      }
      def attrs(s: String): Map[String, String] =
        s.split(",").iterator.filter(_.length >= 2)
          .map(kv => kv.substring(0, 1) -> kv.substring(2)).toMap
      if (st == null) {
        // client-first-message = gs2-header "n,," + client-first-bare
        if (!auth.startsWith("n,,")) return fail("channel binding unsupported")
        val bare = auth.substring(3)
        val a = attrs(bare)
        (a.get("n"), a.get("r")) match {
          case (Some(user), Some(cnonce)) =>
            scramCreds.get(user) match {
              case None => fail("unknown user")
              case Some(c) =>
                val combined = cnonce + Scram.nonce()
                val serverFirst =
                  s"r=$combined,s=${Scram.b64(c.salt)},i=${c.iterations}"
                respond(ErrNone, null, serverFirst.getBytes(UTF_8))
                (false, new ScramSession(user, bare, serverFirst, combined))
            }
          case _ => fail("malformed client-first-message")
        }
      } else {
        // client-final-message = c=biws,r=<nonce>,p=<proof>
        val a = attrs(auth)
        val c = scramCreds(st.user)
        if (!a.get("r").contains(st.nonce) || !a.get("c").contains("biws") ||
            !a.contains("p") || !auth.contains(",p="))
          return fail("malformed client-final-message")
        val withoutProof = auth.substring(0, auth.lastIndexOf(",p="))
        val authMessage =
          st.clientFirstBare + "," + st.serverFirst + "," + withoutProof
        val clientSig = Scram.hmac(c.storedKey, authMessage)
        val recoveredKey = Scram.xor(Scram.unb64(a("p")), clientSig)
        if (!java.security.MessageDigest.isEqual(
            Scram.sha256(recoveredKey), c.storedKey))
          fail("Authentication failed: invalid proof")
        else {
          val serverSig = Scram.hmac(c.serverKey, authMessage)
          respond(ErrNone, null, s"v=${Scram.b64(serverSig)}".getBytes(UTF_8))
          (true, null)
        }
      }
    }

    /** SaslAuthenticate v0–v2: RFC 4616 PLAIN — `[authzid] \0 authcid
      * \0 passwd`. Returns whether the connection is now authenticated.
      */
    private def handleSaslAuthenticate(ver: Int, r: Rd, b: Buf): Boolean = {
      val flex = ver >= 2
      val auth = if (flex) r.cbytes() else r.bytes()
      if (flex) r.tags()
      val parts = new String(auth, UTF_8).split("\u0000", -1)
      val ok = parts.length == 3 &&
        saslUsers.get(parts(1)).contains(parts(2))
      if (ok) { b.i16(ErrNone); if (flex) b.cnstr(null) else b.nstr(null) }
      else {
        b.i16(ErrSaslAuthenticationFailed)
        val msg = "Authentication failed: Invalid username or password"
        if (flex) b.cnstr(msg) else b.nstr(msg)
      }
      if (flex) b.cbytes(Array.empty[Byte]) else b.bytes(Array.empty[Byte])
      if (ver >= 1) b.i64(0L) // session_lifetime_ms (no re-auth required)
      if (flex) b.tags()
      ok
    }

    /** The public state names (Kafka's GroupState) for our internal
      * join-machine states.
      */
    private def publicState(s: String): String = s match {
      case "Joining" => "PreparingRebalance"
      case "AwaitSync" => "CompletingRebalance"
      case other => other // Empty | Stable
    }

    /** ListGroups v0–v4: every group the coordinator knows (including
      * Empty ones holding only committed offsets — what group tooling
      * and the migrator's source-side discovery expect to see).
      * states_filter (v4, KIP-518) narrows by public state name.
      */
    private def handleListGroups(ver: Int, r: Rd, b: Buf): Unit = {
      val flex = ver >= 3
      val statesFilter: Set[String] =
        if (ver >= 4) r.carray(r.cstr()).toSet else Set.empty
      if (flex) r.tags()
      val listed = groups.readOnlySnapshot().toSeq.sortBy(_._1).filter {
        case (_, g) => statesFilter.isEmpty ||
          statesFilter.contains(g.synchronized(publicState(g.state)))
      }
      if (ver >= 1) b.i32(0) // throttle
      b.i16(ErrNone)
      if (flex) {
        b.carray(listed) { case (name, g) =>
          b.cstr(name); b.cstr(g.protocolType)
          if (ver >= 4) b.cstr(g.synchronized(publicState(g.state)))
          b.tags()
        }
        b.tags()
      } else b.array(listed) { case (name, g) =>
        b.str(name); b.str(g.protocolType)
      }
    }

    /** DescribeGroups v0–v5: state, protocol and member roster per
      * group; a group the coordinator has no record of answers state
      * "Dead" with no error, as real brokers do.
      */
    private def handleDescribeGroups(ver: Int, r: Rd, b: Buf): Unit = {
      val flex = ver >= 5
      val asked = if (flex) r.carray(r.cstr()) else r.array(r.str())
      if (ver >= 3) r.i8() // include_authorized_operations
      if (flex) r.tags()
      if (ver >= 1) b.i32(0) // throttle
      def wstr(s: String): Unit = if (flex) b.cstr(s) else b.str(s)
      def wbytes(x: Array[Byte]): Unit = if (flex) b.cbytes(x) else b.bytes(x)
      def writeGroup(name: String): Unit = groups.get(name) match {
        case Some(g) => g.synchronized {
          b.i16(ErrNone); wstr(name); wstr(publicState(g.state))
          wstr(g.protocolType)
          wstr(if (g.state == "Stable") g.protocolName else "")
          val members = g.members.toSeq
          def writeMember(m: (String, Array[Byte])): Unit = {
            wstr(m._1)
            if (ver >= 4) { if (flex) b.cnstr(null) else b.nstr(null) }
            wstr("") // client_id (not tracked by the loopback broker)
            wstr("/127.0.0.1")
            wbytes(m._2)
            wbytes(g.assignments.getOrElse(m._1, Array.empty[Byte]))
            if (flex) b.tags()
          }
          if (flex) b.carray(members)(writeMember)
          else b.array(members)(writeMember)
          if (ver >= 3) b.i32(-2147483648) // authorized_operations
          if (flex) b.tags()
        }
        case None =>
          b.i16(ErrNone); wstr(name); wstr("Dead"); wstr(""); wstr("")
          if (flex) b.carray(Seq.empty[Int])(_ => ())
          else b.array(Seq.empty[Int])(_ => ())
          if (ver >= 3) b.i32(-2147483648)
          if (flex) b.tags()
      }
      if (flex) { b.carray(asked)(writeGroup); b.tags() }
      else b.array(asked)(writeGroup)
    }

    /** DeleteTopics v0–v6: by name through v5, by (name|uuid) struct at
      * v6 (KIP-516). Unknown names answer UNKNOWN_TOPIC_OR_PARTITION,
      * unknown ids UNKNOWN_TOPIC_ID.
      */
    private def handleDeleteTopics(ver: Int, r: Rd, b: Buf): Unit = {
      val flex = ver >= 4
      // asked: Right(name) | Left(uuid) — mirrors handleMetadataFlex
      val asked: Seq[Either[(Long, Long), String]] =
        if (ver >= 6) {
          val byId = topics.keys.map(n => topicUuid(n) -> n).toMap
          r.carray {
            val n = r.cstr(); val id = r.uuid(); r.tags()
            if (n != null) Right(n)
            else byId.get(id).toRight(id)
          }
        } else if (flex) r.carray(r.cstr()).map(Right(_))
        else r.array(r.str()).map(Right(_))
      r.i32() // timeout_ms
      if (flex) r.tags()
      if (ver >= 1) b.i32(0) // throttle
      def writeResult(name: String, id: (Long, Long), err: Short): Unit = {
        if (ver >= 6) { if (flex) b.cnstr(name) else b.nstr(name) }
        else { if (flex) b.cstr(name) else b.str(name) }
        if (ver >= 6) b.uuid(id._1, id._2)
        b.i16(err)
        if (ver >= 5) b.cnstr(null) // error_message
        if (flex) b.tags()
      }
      def one(t: Either[(Long, Long), String]): Unit = t match {
        case Right(name) =>
          val err = if (topics.remove(name).isDefined) ErrNone
                    else ErrUnknownTopicOrPartition
          writeResult(name, topicUuid(name), err)
        case Left(id) =>
          writeResult(null, id, ErrUnknownTopicId)
      }
      if (flex) { b.carray(asked)(one); b.tags() }
      else b.array(asked)(one)
    }

    /** InitProducerId v0–v4 (KIP-98/KIP-360): allocate a producer id +
      * epoch. A null transactional id gets a fresh pid at epoch 0 (the
      * idempotent-only path franz-go's default `idempotent_write` takes);
      * re-init with the same transactional id, or with an explicit
      * current pid (v3+), bumps that pid's epoch — fencing every
      * producer still on an older epoch.
      */
    private def handleInitProducerId(ver: Int, r: Rd, b: Buf): Unit = {
      val flex = ver >= 2
      val txnId = if (flex) r.cstr() else r.nstr()
      val txnTimeout = r.i32() // transaction_timeout_ms
      val askedPid = if (ver >= 3) r.i64() else -1L
      if (ver >= 3) r.i16() // producer_epoch (KIP-360 safety echo)
      if (flex) r.tags()
      def bump(pid: Long): Short =
        producerEpochs.updateWith(pid) {
          case Some(e) => Some((e + 1).toShort)
          case None => Some(0: Short)
        }.get
      // KIP-98: re-initialising an existing pid ABORTS any transaction
      // the previous epoch left open (the crashed producer's data must
      // never commit under the successor's EndTxn — same pid, so the
      // partitions' open ranges would otherwise merge into its txn)
      def abortDangling(p: Long, e: Short): Unit = {
        txnTouchedAtMs.remove(p)
        txnPartitions.remove(p).getOrElse(Set.empty).foreach {
          case (t, pt) => topics.get(t).flatMap(_.lift(pt))
            .foreach(_.endTxn(p, e, commit = false))
        }
      }
      val (pid, epoch): (Long, Short) =
        if (askedPid >= 0L && producerEpochs.contains(askedPid)) {
          val e = bump(askedPid)
          abortDangling(askedPid, e)
          (askedPid, e)
        } else if (txnId != null && txnId.nonEmpty) {
          val p = txnProducers.getOrElseUpdate(txnId,
            nextProducerId.getAndIncrement())
          if (txnTimeout > 0) txnTimeoutMs.put(p, txnTimeout)
          val e = bump(p)
          abortDangling(p, e)
          (p, e)
        } else {
          val p = nextProducerId.getAndIncrement()
          producerEpochs.put(p, 0)
          (p, 0: Short)
        }
      b.i32(0) // throttle
      b.i16(ErrNone)
      b.i64(pid)
      b.i16(epoch)
      if (flex) b.tags()
    }

    private def handleApiVersions(ver: Int, r: Rd, b: Buf): Unit = {
          // Advertise ONLY versions whose wire shape is implemented — an
          // ApiVersions entry is one contiguous range per key, so every
          // version inside the range must dispatch correctly. The
          // data-path apis now cover their full negotiation windows:
          // Produce 3–9 (one request shape 3–8, version-gated response
          // fields, flexible v9) and Fetch 4–13 (non-flexible 4–11 with
          // version-gated session/epoch/rack fields, flexible v12 by
          // name, v13 by topic id) — so sarama-era defaults (Produce v7,
          // Fetch v11) and any franz-go pick interop instead of failing
          // negotiation. r15 extends the offset/coordinator control plane
          // the same way: ListOffsets 1–7 (isolation at v2, leader epoch
          // at v4, flexible v6, -3/max-timestamp at v7), FindCoordinator
          // 0–4 (key_type at v1, flexible v3, batched coordinator_keys at
          // v4 per KIP-699) and OffsetFetch 2–8 (throttle v3, leader
          // epoch v5, flexible v6, require_stable v7, batched groups v8
          // per KIP-709) — the shapes a franz-go-era consumer group
          // actually sends. The group-membership apis complete the
          // window (r15): JoinGroup 2–9 (group_instance_id v5, flexible
          // v6, KIP-559 protocol_type v7, reason v8, skip_assignment
          // v9), SyncGroup 1–5, Heartbeat 1–4, LeaveGroup 1–5 (batched
          // members at v3), OffsetCommit 2–8 (retention dropped at v5
          // per KIP-211, leader epoch v6, flexible v8) — so a default
          // franz-go/librdkafka consumer group negotiates its native
          // versions end to end instead of the floor of each range.
          val supported = Seq(ApiProduce -> (3, 9), ApiFetch -> (4, 13),
            ApiListOffsets -> (1, 7), ApiMetadata -> (0, 12),
            ApiOffsetCommit -> (2, 8), ApiOffsetFetch -> (2, 8),
            ApiFindCoordinator -> (0, 4), ApiJoinGroup -> (2, 9),
            ApiHeartbeat -> (1, 4), ApiLeaveGroup -> (1, 5),
            ApiSyncGroup -> (1, 5), ApiVersions -> (3, 3),
            ApiCreateTopics -> (1, 1), ApiInitProducerId -> (0, 4),
            ApiListGroups -> (0, 4), ApiDescribeGroups -> (0, 5),
            ApiDeleteTopics -> (0, 6), ApiSaslHandshake -> (0, 1),
            ApiSaslAuthenticate -> (0, 2), ApiAddPartitionsToTxn -> (0, 3),
            ApiEndTxn -> (0, 3))
          if (ver >= 3) { // flexible BODY (response header stays v0)
            r.cstr(); r.cstr(); r.tags() // client_software_name/version
            b.i16(ErrNone)
            b.carray(supported) { case (k, (lo, hi)) =>
              b.i16(k); b.i16(lo); b.i16(hi); b.tags() }
            b.i32(0) // throttle
            b.tags()
          } else {
            b.i16(ErrNone)
            b.array(supported) { case (k, (lo, hi)) => b.i16(k); b.i16(lo); b.i16(hi) }
          }
    }

    private def handleMetadataFlex(ver: Int, r: Rd, b: Buf): Unit = {
          // flexible v9–v12: topic ids enter the RESPONSE at v10 and the
          // REQUEST topic struct at v10; include_cluster_authorized_
          // operations exists v9–v10 only (KIP-700 removed it at v11).
          // A v10+ ask may address a topic by id with a NULL name — those
          // resolve through the uuid reverse map (same as Fetch v13); an
          // id no topic has answers UNKNOWN_TOPIC_ID with the id echoed.
          val byId = topics.keys.map(n => topicUuid(n) -> n).toMap
          val asked: Seq[Either[(Long, Long), String]] = r.carray {
            val id = if (ver >= 10) r.uuid() else (0L, 0L)
            val n = r.cstr(); r.tags()
            if (n != null) Right(n)
            else byId.get(id).toRight(id)
          }
          r.i8() // allow_auto_topic_creation
          if (ver <= 10) r.i8() // include_cluster_authorized_operations
          r.i8() // include_topic_authorized_operations
          r.tags()
          val names: Seq[Either[(Long, Long), String]] =
            if (asked == null || asked.isEmpty)
              topics.keys.toSeq.sorted.map(Right(_))
            else asked
          b.i32(0) // throttle
          b.carray(Seq(1)) { id =>
            b.i32(id); b.cstr("127.0.0.1"); b.i32(port); b.cnstr(null); b.tags() }
          b.cnstr("graft-loopback") // cluster_id
          b.i32(1)                  // controller id
          b.carray(names) {
            case Right(name) =>
              val (hi, lo) = topicUuid(name)
              topics.get(name) match {
                case Some(parts) =>
                  b.i16(ErrNone); b.cnstr(name)
                  if (ver >= 10) b.uuid(hi, lo)
                  b.i8(0) // is_internal
                  b.carray(parts.indices) { p =>
                    b.i16(ErrNone); b.i32(p); b.i32(1); b.i32(0)
                    b.carray(Seq(1))(b.i32); b.carray(Seq(1))(b.i32)
                    b.carray(Seq.empty[Int])(b.i32); b.tags()
                  }
                  b.i32(-2147483648) // topic_authorized_operations
                  b.tags()
                case None =>
                  b.i16(ErrUnknownTopicOrPartition); b.cnstr(name)
                  if (ver >= 10) b.uuid(0L, 0L)
                  b.i8(0)
                  b.carray(Seq.empty[Int])(_ => ())
                  b.i32(-2147483648); b.tags()
              }
            case Left((ihi, ilo)) =>
              b.i16(ErrUnknownTopicId); b.cnstr(null)
              if (ver >= 10) b.uuid(ihi, ilo)
              b.i8(0)
              b.carray(Seq.empty[Int])(_ => ())
              b.i32(-2147483648); b.tags()
          }
          if (ver <= 10) b.i32(-2147483648) // cluster_authorized_operations
          b.tags()
    }

    private def handleMetadataLegacy(ver: Int, r: Rd, b: Buf): Unit = {
          // non-flexible v0–v8: the fields sarama-era clients expect grow
          // by version — rack/controller/is_internal at v1, cluster_id at
          // v2, throttle at v3, allow_auto request flag at v4, offline
          // replicas at v5, leader_epoch at v7, authorized-operations
          // request flags + response ints at v8
          val asked = r.narray(r.str())
          if (ver >= 4) r.i8() // allow_auto_topic_creation
          if (ver >= 8) { r.i8(); r.i8() } // include_*_authorized_operations
          val names =
            if (asked == null || asked.isEmpty) topics.keys.toSeq.sorted
            else asked
          if (ver >= 3) b.i32(0) // throttle
          b.array(Seq(1)) { id =>
            b.i32(id); b.str("127.0.0.1"); b.i32(port)
            if (ver >= 1) b.nstr(null) // rack
          }
          if (ver >= 2) b.nstr("graft-loopback") // cluster_id
          if (ver >= 1) b.i32(1) // controller id
          b.array(names) { name =>
            topics.get(name) match {
              case Some(parts) =>
                b.i16(ErrNone); b.str(name)
                if (ver >= 1) b.i8(0) // is_internal=false
                b.array(parts.indices) { p =>
                  b.i16(ErrNone); b.i32(p); b.i32(1)
                  if (ver >= 7) b.i32(0) // leader_epoch
                  b.array(Seq(1))(b.i32); b.array(Seq(1))(b.i32)
                  if (ver >= 5) b.array(Seq.empty[Int])(b.i32) // offline
                }
                if (ver >= 8) b.i32(-2147483648) // topic_authorized_operations
              case None =>
                b.i16(ErrUnknownTopicOrPartition); b.str(name)
                if (ver >= 1) b.i8(0)
                b.array(Seq.empty[Int])(_ => ())
                if (ver >= 8) b.i32(-2147483648)
            }
          }
          if (ver >= 8) b.i32(-2147483648) // cluster_authorized_operations
    }

    private def handleCreateTopics(ver: Int, r: Rd, b: Buf): Unit = {
          val reqs = r.array {
            val name = r.str(); val nParts = r.i32(); r.i16() // replication
            r.array { r.i32(); r.array(r.i32()); () }         // assignments
            r.array { r.str(); r.nstr(); () }                 // configs
            (name, nParts)
          }
          r.i32() // timeout
          b.array(reqs) { case (name, nParts) =>
            b.str(name)
            if (topics.putIfAbsent(name,
                Array.tabulate(math.max(nParts, 1))(new PartitionLog(_))).isEmpty)
              b.i16(ErrNone)
            else b.i16(ErrTopicAlreadyExists)
          }
    }

    private def handleProduceFlex(ver: Int, r: Rd, b: Buf): Unit = {
          r.cstr() // transactional_id
          r.i16()  // acks
          r.i32()  // timeout
          val results = r.carray {
            val topic = r.cstr()
            val parts = r.carray {
              val p = r.i32()
              val recordSet = r.cbytes()
              r.tags()
              val (err, baseOff) = topics.get(topic).map(_.lift(p)) match {
                case Some(Some(log)) =>
                  // header-scan + CRC only; bodies parse lazily on demand
                  try (ErrNone, log.appendRaw(recordSet, producerEpochs.get))
                  catch {
                    case _: CorruptBatch => (ErrCorruptMessage, -1L)
                    case e: WireError => (e.code, -1L)
                  }
                case _ => (ErrUnknownTopicOrPartition, -1L)
              }
              (p, err, baseOff)
            }
            r.tags()
            (topic, parts)
          }
          r.tags()
          b.carray(results) { case (topic, parts) =>
            b.cstr(topic)
            b.carray(parts) { case (p, err, off) =>
              b.i32(p); b.i16(err); b.i64(off)
              b.i64(-1L) // log_append_time
              b.i64(0L)  // log_start_offset
              b.carray(Seq.empty[Int])(_ => ()) // record_errors
              b.cnstr(null)                     // error_message
              b.tags()
            }
            b.tags()
          }
          b.i32(0) // throttle
          b.tags()
    }

    private def handleProduceLegacy(ver: Int, r: Rd, b: Buf): Unit = {
          // non-flexible v3–v8: ONE request shape across the range (the
          // fields sarama/franz-go send never changed between v3 and v8);
          // the RESPONSE grows by version — log_start_offset at v5,
          // record_errors + error_message at v8. This is what lets
          // ApiVersions advertise the contiguous 3–9 range real clients
          // negotiate inside (sarama's default Produce v7 lands here).
          r.nstr() // transactional_id
          r.i16()  // acks
          r.i32()  // timeout
          val results = r.array {
            val topic = r.str()
            val parts = r.array {
              val p = r.i32()
              val recordSet = r.nbytes()
              val (err, baseOff) = topics.get(topic).map(_.lift(p)) match {
                case Some(Some(log)) =>
                  try (ErrNone, log.appendRaw(recordSet, producerEpochs.get))
                  catch {
                    case _: CorruptBatch => (ErrCorruptMessage, -1L)
                    case e: WireError => (e.code, -1L)
                  }
                case _ => (ErrUnknownTopicOrPartition, -1L)
              }
              (p, err, baseOff)
            }
            (topic, parts)
          }
          b.array(results) { case (topic, parts) =>
            b.str(topic)
            b.array(parts) { case (p, err, off) =>
              b.i32(p); b.i16(err); b.i64(off); b.i64(-1L) // log_append_time
              if (ver >= 5) b.i64(0L) // log_start_offset
              if (ver >= 8) {
                b.i32(0)     // record_errors: empty
                b.nstr(null) // error_message
              }
            }
          }
          b.i32(0) // throttle
    }

    /** Shared per-partition fetch serving: (error, endToReport, bytes).
      * isolation 1 (read_committed, KIP-98) reports the LSO as the end
      * offset and serves only committed records; the raw batch
      * passthrough (fetchCodec honored only on the re-encode fallback,
      * like a real broker serving producer compression as-is) runs for
      * read_uncommitted — control batches travel verbatim and consumers
      * skip them, exactly the real contract.
      */
    private def serveFetch(logOpt: Option[PartitionLog], off: Long,
                           isolation: Int): (Short, Long, Array[Byte]) =
      logOpt match {
        case Some(log) =>
          val committed = isolation == 1
          // a read_committed fetch is where a hung transaction blocks
          // progress (the LSO pins below it) — the expiry sweep runs
          // here so a timed-out txn aborts and the LSO advances
          if (committed) expireStaleTxns()
          val end = if (committed) log.lso else log.end
          if (off > end) (ErrOffsetOutOfRange, end, Array.empty[Byte])
          else {
            val bytes = (if (fetchCodec == CodecNone && !committed)
                log.rawSlice(off, maxFetchRecords) else None)
              .getOrElse {
                val recs = log.slice(off, maxFetchRecords, end, committed)
                if (recs.isEmpty) Array.empty[Byte]
                else encodeBatch(recs, fetchCodec)
              }
            (ErrNone, end, bytes)
          }
        case None => (ErrUnknownTopicOrPartition, -1L, Array.empty[Byte])
      }

    private def handleFetchFlex(ver: Int, r: Rd, b: Buf): Unit = {
          // v12/v13 flexible: v13 addresses topics by KIP-516 topic id,
          // v12 (the first flexible fetch) still by name; the rest of the
          // shape is shared. Incremental-session fields are present but
          // sessions unused (0/-1 from our client = full fetch, like a
          // sessionless consumer).
          r.i32(); r.i32(); r.i32(); r.i32() // replica/wait/min/max
          val isolation = r.i8().toInt
          r.i32(); r.i32() // session_id, session_epoch
          val byId = topics.keys.map(n => topicUuid(n) -> n).toMap
          val results = r.carray {
            val (tid, topic) =
              if (ver >= 13) { val u = r.uuid(); (u, byId.getOrElse(u, null)) }
              else { val n = r.cstr(); ((0L, 0L), n) }
            val parts = r.carray {
              val p = r.i32(); r.i32() // current_leader_epoch
              val off = r.i64()
              r.i32()  // last_fetched_epoch
              r.i64()  // log_start_offset
              r.i32()  // partition_max_bytes
              r.tags()
              val (err, end, bytes) = serveFetch(
                if (topic == null) None else topics.get(topic).flatMap(_.lift(p)),
                off, isolation)
              (p, err, end, bytes)
            }
            r.tags()
            (tid, topic, parts)
          }
          r.carray { // forgotten topics: id (v13+) or name (v12)
            if (ver >= 13) r.uuid() else r.cstr()
            r.carray(r.i32()); r.tags()
          }
          r.cstr() // rack_id
          r.tags()
          b.i32(0)       // throttle
          b.i16(ErrNone) // top-level error
          b.i32(0)       // session_id
          b.carray(results) { case (tid, topic, parts) =>
            if (ver >= 13) b.uuid(tid._1, tid._2) else b.cstr(topic)
            b.carray(parts) { case (p, err, hw, bytes) =>
              b.i32(p); b.i16(err); b.i64(hw); b.i64(hw) // last_stable_offset
              b.i64(0L)          // log_start_offset
              b.carray(Seq.empty[Int])(_ => ()) // aborted_transactions ([], non-null)
              b.i32(-1)          // preferred_read_replica
              if (bytes.isEmpty) b.uv(0) else b.cnbytes(bytes)
              b.tags()
            }
            b.tags()
          }
          b.tags()
    }

    private def handleFetchMid(ver: Int, r: Rd, b: Buf): Unit = {
          // non-flexible v5–v11 — the window sarama and older franz-go
          // negotiate into (Fetch v11 is the sarama-era default). Request
          // grows: session fields at v7, current_leader_epoch at v9,
          // rack_id at v11; response grows: log_start_offset at v5,
          // top-level error + session_id at v7, preferred_read_replica
          // at v11.
          r.i32(); r.i32(); r.i32(); r.i32() // replica/wait/min/max
          val isolation = r.i8().toInt
          if (ver >= 7) { r.i32(); r.i32() } // session_id, session_epoch
          val results = r.array {
            val topic = r.str()
            val parts = r.array {
              val p = r.i32()
              if (ver >= 9) r.i32() // current_leader_epoch
              val off = r.i64()
              r.i64() // log_start_offset
              r.i32() // partition_max_bytes
              val (err, end, bytes) = serveFetch(
                topics.get(topic).flatMap(_.lift(p)), off, isolation)
              (p, err, end, bytes)
            }
            (topic, parts)
          }
          if (ver >= 7) r.array { r.str(); r.array(r.i32()) } // forgotten topics
          if (ver >= 11) r.str() // rack_id
          b.i32(0) // throttle
          if (ver >= 7) { b.i16(ErrNone); b.i32(0) } // error_code, session_id
          b.array(results) { case (topic, parts) =>
            b.str(topic)
            b.array(parts) { case (p, err, hw, bytes) =>
              b.i32(p); b.i16(err); b.i64(hw); b.i64(hw) // last_stable_offset
              b.i64(0L) // log_start_offset
              b.i32(-1) // aborted_transactions (null)
              if (ver >= 11) b.i32(-1) // preferred_read_replica
              if (bytes.isEmpty) b.i32(-1) else b.nbytes(bytes)
            }
          }
    }

    private def handleFetchV4(ver: Int, r: Rd, b: Buf): Unit = {
          r.i32(); r.i32(); r.i32(); r.i32() // replica/wait/min/max
          val isolation = r.i8().toInt
          val results = r.array {
            val topic = r.str()
            val parts = r.array {
              val p = r.i32(); val off = r.i64(); r.i32() // partition_max_bytes
              val (err, end, bytes) = serveFetch(
                topics.get(topic).flatMap(_.lift(p)), off, isolation)
              (p, err, end, bytes)
            }
            (topic, parts)
          }
          b.i32(0) // throttle
          b.array(results) { case (topic, parts) =>
            b.str(topic)
            b.array(parts) { case (p, err, hw, bytes) =>
              b.i32(p); b.i16(err); b.i64(hw); b.i64(hw) // last_stable_offset
              b.i32(-1)                                  // aborted_transactions (null)
              if (bytes.isEmpty) b.i32(-1) else b.nbytes(bytes)
            }
          }
    }

    private def handleListOffsets(ver: Int, r: Rd, b: Buf): Unit = {
          // v1–v7: isolation_level at v2, current_leader_epoch in the
          // partition ask at v4, flexible at v6; response gains throttle
          // at v2 and leader_epoch at v4. Timestamps: -1 latest (log
          // end), -2 earliest, -3 max-timestamp (v7, KIP-734 — the
          // loopback log answers with its last offset).
          val flex = ver >= 6
          r.i32() // replica_id
          val isolation = if (ver >= 2) r.i8().toInt else 0
          if (isolation == 1) expireStaleTxns()
          def partAsk(topic: String): (Int, Short, Long) = {
            val p = r.i32()
            if (ver >= 4) r.i32() // current_leader_epoch
            val ts = r.i64()
            if (flex) r.tags()
            topics.get(topic).map(_.lift(p)) match {
              case Some(Some(log)) =>
                val off =
                  if (ts == -2L) 0L
                  else if (ts == -3L) math.max(log.end - 1, -1L)
                  // KIP-98: a read_committed "latest" is the LSO — the
                  // consumer's planned end never crosses an open txn
                  else if (isolation == 1) log.lso
                  else log.end
                (p, ErrNone, off)
              case _ => (p, ErrUnknownTopicOrPartition, -1L)
            }
          }
          def topicAsk(): (String, Seq[(Int, Short, Long)]) =
            if (flex) {
              val topic = r.cstr()
              val parts = r.carray(partAsk(topic)); r.tags()
              (topic, parts)
            } else {
              val topic = r.str()
              (topic, r.array(partAsk(topic)))
            }
          val results = if (flex) { val x = r.carray(topicAsk()); r.tags(); x }
            else r.array(topicAsk())
          if (ver >= 2) b.i32(0) // throttle
          def writePart(p: Int, err: Short, off: Long): Unit = {
            b.i32(p); b.i16(err); b.i64(-1L); b.i64(off)
            if (ver >= 4) b.i32(0) // leader_epoch
            if (flex) b.tags()
          }
          if (flex) {
            b.carray(results) { case (topic, parts) =>
              b.cstr(topic)
              b.carray(parts) { case (p, err, off) => writePart(p, err, off) }
              b.tags()
            }
            b.tags()
          } else b.array(results) { case (topic, parts) =>
            b.str(topic)
            b.array(parts) { case (p, err, off) => writePart(p, err, off) }
          }
    }

    private def handleFindCoordinator(ver: Int, r: Rd, b: Buf): Unit = {
          // v0–v4: key_type (group/txn) at v1 — a single node coordinates
          // everything, so the type only has to parse; flexible at v3;
          // v4 batches coordinator_keys and answers per key (KIP-699).
          if (ver >= 4) {
            r.i8() // key_type
            val keys = r.carray(r.cstr())
            r.tags()
            b.i32(0) // throttle
            b.carray(keys) { k =>
              b.cstr(k); b.i32(1); b.cstr("127.0.0.1"); b.i32(port)
              b.i16(ErrNone); b.cnstr(null); b.tags()
            }
            b.tags()
          } else {
            val flex = ver >= 3
            if (flex) r.cstr() else r.str() // key — always this broker
            if (ver >= 1) r.i8() // key_type
            if (flex) r.tags()
            if (ver >= 1) b.i32(0) // throttle
            b.i16(ErrNone)
            if (ver >= 1) { if (flex) b.cnstr(null) else b.nstr(null) } // error_message
            b.i32(1)
            if (flex) b.cstr("127.0.0.1") else b.str("127.0.0.1")
            b.i32(port)
            if (flex) b.tags()
          }
    }

    private def handleJoinGroup(ver: Int, r: Rd, b: Buf): Unit = {
          // v2–v9: group_instance_id parsed at v5+ (static membership is
          // ACCEPTED but treated as dynamic — this single-node
          // coordinator has no fencing to skip), flexible at v6,
          // nullable response protocol_type/name at v7 (KIP-559), join
          // reason at v8 (KIP-800), skip_assignment at v9 (always false:
          // the leader computes assignments exactly as in classic
          // groups). Franz-go-era clients pick v9 from the advertised
          // range; sarama-era ones pick v2–v5.
          val flex = ver >= 6
          val groupId = if (flex) r.cstr() else r.str()
          r.i32() // session_timeout
          val rebalanceTimeout = r.i32()
          val memberIdIn = if (flex) r.cstr() else r.str()
          if (ver >= 5) { if (flex) r.cstr() else r.nstr() } // group_instance_id
          val protocolType = if (flex) r.cstr() else r.str()
          val protocols =
            if (flex) r.carray {
              val n = r.cstr(); val m = r.cbytes(); r.tags(); (n, m)
            } else r.array { (r.str(), r.bytes()) }
          if (ver >= 8) { if (flex) r.cstr() else r.nstr() } // reason
          if (flex) r.tags()
          val g = groups.getOrElseUpdate(groupId, new Group)
          val (err, gen, proto, leader, memberId, members) =
            if (ver >= 4 && memberIdIn.isEmpty)
              // KIP-394: v4+ dynamic members must first be issued a
              // member id and rejoin with it — the two-round-trip join
              // every modern client performs
              (ErrMemberIdRequired, -1, "", "",
                s"graft-${g.memberSeq.incrementAndGet()}",
                Seq.empty[(String, Array[Byte])])
            else if (g.synchronized(g.members.nonEmpty &&
                     protocolType.nonEmpty && protocolType != g.protocolType))
              // KIP-559 cross-check: a joiner whose protocol type
              // contradicts the live group's is rejected, not silently
              // admitted as dynamic
              (ErrInconsistentGroupProtocol, -1, "", "", memberIdIn,
                Seq.empty[(String, Array[Byte])])
            else joinGroup(g, memberIdIn, protocolType, protocols,
              math.max(rebalanceTimeout, 1000))
          b.i32(0) // throttle
          b.i16(err); b.i32(gen)
          if (ver >= 7) {
            val pt = if (err == ErrNone) g.protocolType else null
            if (flex) b.cnstr(pt) else b.nstr(pt)
          }
          if (flex) b.cstr(proto) else b.str(proto)
          if (flex) b.cstr(leader) else b.str(leader)
          if (ver >= 9) b.i8(0) // skip_assignment
          if (flex) b.cstr(memberId) else b.str(memberId)
          if (flex) b.carray(members) { case (m, meta) =>
            b.cstr(m); b.cnstr(null); b.cbytes(meta); b.tags()
          } else b.array(members) { case (m, meta) =>
            b.str(m)
            if (ver >= 5) b.nstr(null) // group_instance_id
            b.bytes(meta)
          }
          if (flex) b.tags()
    }

    private def handleSyncGroup(ver: Int, r: Rd, b: Buf): Unit = {
          // v1–v5: group_instance_id at v3, flexible at v4, the group's
          // protocol_type/name echoed both ways at v5 (KIP-559).
          val flex = ver >= 4
          val groupId = if (flex) r.cstr() else r.str()
          val gen = r.i32()
          val memberId = if (flex) r.cstr() else r.str()
          if (ver >= 3) { if (flex) r.cstr() else r.nstr() } // group_instance_id
          // v5 (KIP-559): the client's view of the group's protocol —
          // cross-checked below, not discarded (flex-only versions)
          val (ptIn, pnIn) =
            if (ver >= 5) (r.cstr(), r.cstr()) else (null, null)
          val assignments =
            if (flex) r.carray {
              val m = r.cstr(); val a = r.cbytes(); r.tags(); (m, a)
            } else r.array { (r.str(), r.bytes()) }
          if (flex) r.tags()
          val g = groups.getOrElseUpdate(groupId, new Group)
          val (err, assignment) =
            if ((ptIn != null && ptIn != g.protocolType) ||
                (pnIn != null && pnIn != g.protocolName))
              (ErrInconsistentGroupProtocol, Array.empty[Byte])
            else syncGroup(g, gen, memberId, assignments)
          b.i32(0) // throttle
          b.i16(err)
          if (ver >= 5) { b.cnstr(g.protocolType); b.cnstr(g.protocolName) }
          if (flex) { b.cbytes(assignment); b.tags() } else b.bytes(assignment)
    }

    private def handleHeartbeat(ver: Int, r: Rd, b: Buf): Unit = {
          // v1–v4: group_instance_id at v3, flexible at v4; the response
          // is throttle + error at every version.
          val flex = ver >= 4
          val groupId = if (flex) r.cstr() else r.str()
          val gen = r.i32()
          val memberId = if (flex) r.cstr() else r.str()
          if (ver >= 3) { if (flex) r.cstr() else r.nstr() } // group_instance_id
          if (flex) r.tags()
          val err = groups.get(groupId) match {
            case None => ErrUnknownMemberId
            case Some(g) => g.synchronized {
              if (!g.members.contains(memberId)) ErrUnknownMemberId
              else if (gen != g.generation) ErrIllegalGeneration
              else if (g.state != "Stable") ErrRebalanceInProgress
              else ErrNone
            }
          }
          b.i32(0); b.i16(err)
          if (flex) b.tags()
    }

    private def handleLeaveGroup(ver: Int, r: Rd, b: Buf): Unit = {
          // v1–v5: v3 batches members (KIP-345 static-membership
          // removals) and adds per-member results; flexible at v4;
          // leave reason at v5 (KIP-800).
          val flex = ver >= 4
          val groupId = if (flex) r.cstr() else r.str()
          val leaving: Seq[(String, String)] = // (member_id, instance_id)
            if (ver >= 3) {
              val ms =
                if (flex) r.carray {
                  val m = r.cstr(); val gi = r.cstr()
                  if (ver >= 5) r.cstr() // reason
                  r.tags(); (m, gi)
                } else r.array { (r.str(), r.nstr()) }
              if (flex) r.tags()
              ms
            } else Seq((r.str(), null))
          groups.get(groupId).foreach { g =>
            g.synchronized {
              leaving.foreach { case (memberId, _) =>
                g.members.remove(memberId); g.joiners.remove(memberId); ()
              }
              if (g.members.isEmpty) { g.state = "Empty"; g.leader = null }
              else {
                // remaining members must rejoin: heartbeats now fail
                g.state = "Joining"
                g.expected = g.members.keySet.toSet
                g.joiners.clear()
                g.joinDeadline = System.currentTimeMillis() + joinDelayMs
              }
              g.notifyAll()
            }
          }
          b.i32(0); b.i16(ErrNone)
          if (ver >= 3) {
            if (flex) b.carray(leaving) { case (m, gi) =>
              b.cstr(m); b.cnstr(gi); b.i16(ErrNone); b.tags()
            } else b.array(leaving) { case (m, gi) =>
              b.str(m); b.nstr(gi); b.i16(ErrNone)
            }
          }
          if (flex) b.tags()
    }

    private def handleOffsetCommit(ver: Int, r: Rd, b: Buf): Unit = {
          // v2–v8: retention_time_ms exists ONLY at v2–v4 (KIP-211
          // removed it at v5), committed_leader_epoch arrives at v6,
          // group_instance_id at v7, flexible at v8. Response shape is
          // stable (throttle at v3 + per-partition error codes).
          val flex = ver >= 8
          val groupId = if (flex) r.cstr() else r.str()
          val gen = r.i32()
          val memberId = if (flex) r.cstr() else r.str()
          if (ver >= 7) { if (flex) r.cstr() else r.nstr() } // group_instance_id
          if (ver <= 4) r.i64() // retention_time_ms
          val reqs =
            if (flex) r.carray {
              val topic = r.cstr()
              val parts = r.carray {
                val p = r.i32(); val off = r.i64()
                r.i32() // committed_leader_epoch
                r.cstr(); r.tags(); (p, off)
              }
              r.tags(); (topic, parts)
            } else r.array {
              val topic = r.str()
              val parts = r.array {
                val p = r.i32(); val off = r.i64()
                if (ver >= 6) r.i32() // committed_leader_epoch
                r.nstr(); (p, off)
              }
              (topic, parts)
            }
          if (flex) r.tags()
          val g = groups.getOrElseUpdate(groupId, new Group)
          val err = g.synchronized {
            // generation -1 + empty member = simple (non-group) commit
            if (gen == -1 && memberId.isEmpty) ErrNone
            else if (!g.members.contains(memberId)) ErrUnknownMemberId
            else if (gen != g.generation) ErrIllegalGeneration
            else ErrNone
          }
          if (err == ErrNone) g.synchronized {
            reqs.foreach { case (t, parts) =>
              parts.foreach { case (p, off) => g.committed((t, p)) = off }
            }
          }
          if (ver >= 3) b.i32(0) // throttle
          if (flex) {
            b.carray(reqs) { case (topic, parts) =>
              b.cstr(topic)
              b.carray(parts) { case (p, _) => b.i32(p); b.i16(err); b.tags() }
              b.tags()
            }
            b.tags()
          } else b.array(reqs) { case (topic, parts) =>
            b.str(topic)
            b.array(parts) { case (p, _) => b.i32(p); b.i16(err) }
          }
    }

    private def handleOffsetFetch(ver: Int, r: Rd, b: Buf): Unit = {
          // v2–v8: throttle at v3, committed_leader_epoch at v5, flexible
          // at v6, require_stable at v7, and v8 batches whole GROUPS
          // (KIP-709) — group-level error replaces the top-level one.
          val flex = ver >= 6
          def lookup(groupId: String, asked: Seq[(String, Seq[Int])])
              : Seq[(String, Seq[(Int, Long)])] = {
            val g = groups.getOrElseUpdate(groupId, new Group)
            g.synchronized {
              if (asked == null)
                g.committed.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).map {
                  case (t, offs) => (t, offs.map { case ((_, p), o) => (p, o) }.sortBy(_._1))
                }
              else asked.map { case (t, ps) =>
                (t, ps.map(p => (p, g.committed.getOrElse((t, p), -1L))))
              }
            }
          }
          def writeParts(parts: Seq[(Int, Long)]): Unit =
            if (flex) b.carray(parts) { case (p, off) =>
              b.i32(p); b.i64(off); b.i32(-1); b.cnstr(null); b.i16(ErrNone)
              b.tags()
            } else b.array(parts) { case (p, off) =>
              b.i32(p); b.i64(off)
              if (ver >= 5) b.i32(-1) // committed_leader_epoch
              b.nstr(null); b.i16(ErrNone)
            }
          if (ver >= 8) {
            val gs = r.carray {
              val gid = r.cstr()
              val asked = r.carray {
                val t = r.cstr(); val ps = r.carray(r.i32()); r.tags(); (t, ps)
              }
              r.tags()
              (gid, asked)
            }
            r.i8() // require_stable
            r.tags()
            b.i32(0) // throttle
            b.carray(gs) { case (gid, asked) =>
              b.cstr(gid)
              b.carray(lookup(gid, asked)) { case (topic, parts) =>
                b.cstr(topic); writeParts(parts); b.tags()
              }
              b.i16(ErrNone) // group-level error
              b.tags()
            }
            b.tags()
          } else {
            val groupId = if (flex) r.cstr() else r.str()
            val asked =
              if (flex) r.carray {
                val t = r.cstr(); val ps = r.carray(r.i32()); r.tags(); (t, ps)
              } else r.narray { val t = r.str(); val ps = r.array(r.i32()); (t, ps) }
            if (ver >= 7) r.i8() // require_stable
            if (flex) r.tags()
            val results = lookup(groupId, asked)
            if (ver >= 3) b.i32(0) // throttle
            if (flex) {
              b.carray(results) { case (topic, parts) =>
                b.cstr(topic); writeParts(parts); b.tags()
              }
              b.i16(ErrNone) // top-level error
              b.tags()
            } else {
              b.array(results) { case (topic, parts) =>
                b.str(topic); writeParts(parts)
              }
              b.i16(ErrNone) // v2+ top-level error
            }
          }
    }


    /** The join barrier: a rebalance completes when every member of
      * the previous generation has rejoined, or the join window
      * elapses (admitting whoever arrived — how a real coordinator
      * ejects slow members at rebalance timeout).
      */
    private def joinGroup(g: Group, memberIdIn: String, protocolType: String,
                          protocols: Seq[(String, Array[Byte])],
                          timeoutMs: Int)
        : (Short, Int, String, String, String, Seq[(String, Array[Byte])]) =
      g.synchronized {
        val memberId =
          if (memberIdIn.nonEmpty) memberIdIn
          else s"graft-${g.memberSeq.incrementAndGet()}"
        if (g.state == "Stable" || g.state == "Empty" || g.state == "AwaitSync") {
          g.state = "Joining"
          g.expected = g.members.keySet.toSet
          g.joiners.clear()
          g.joinDeadline = System.currentTimeMillis() + joinDelayMs
        }
        g.joiners(memberId) = protocols.headOption.map(_._2)
          .getOrElse(Array.empty[Byte])
        g.notifyAll()
        val hardDeadline = System.currentTimeMillis() + timeoutMs
        def barrierDown: Boolean = {
          val now = System.currentTimeMillis()
          val allRejoined = g.expected.nonEmpty &&
            g.expected.forall(m => g.joiners.contains(m) || !g.members.contains(m))
          g.state != "Joining" || now >= g.joinDeadline ||
            (allRejoined && g.joiners.size >= g.expected.size)
        }
        while (!barrierDown && System.currentTimeMillis() < hardDeadline)
          g.wait(math.max(1L,
            math.min(g.joinDeadline, hardDeadline) - System.currentTimeMillis()))
        if (g.state == "Joining") {
          // first thread past the barrier completes the generation
          g.generation += 1
          g.members.clear()
          g.joiners.foreach { case (m, meta) => g.members(m) = meta }
          g.leader = g.members.head._1
          g.state = "AwaitSync"
          g.notifyAll()
        }
        val protoName = protocols.headOption.map(_._1).getOrElse("range")
        g.protocolName = protoName
        if (protocolType.nonEmpty) g.protocolType = protocolType
        val memberList =
          if (memberId == g.leader) g.members.toSeq
          else Seq.empty
        (ErrNone, g.generation, protoName, g.leader, memberId, memberList)
      }

    private def syncGroup(g: Group, gen: Int, memberId: String,
                          assignments: Seq[(String, Array[Byte])])
        : (Short, Array[Byte]) = g.synchronized {
      if (!g.members.contains(memberId)) (ErrUnknownMemberId, Array.empty[Byte])
      else if (gen != g.generation) (ErrIllegalGeneration, Array.empty[Byte])
      else {
        if (memberId == g.leader) {
          g.assignments = assignments.toMap
          g.state = "Stable"
          g.notifyAll()
        }
        val deadline = System.currentTimeMillis() + 10000
        while (g.state != "Stable" && System.currentTimeMillis() < deadline)
          g.wait(50)
        if (g.state != "Stable") (ErrRebalanceInProgress, Array.empty[Byte])
        else (ErrNone, g.assignments.getOrElse(memberId, Array.empty[Byte]))
      }
    }
  }

  // ── client connection ───────────────────────────────────────────────

  private final class Conn(host: String, port: Int, clientId: String) {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), 10000)
    sock.setTcpNoDelay(true)
    private val in = new DataInputStream(sock.getInputStream)
    private val out = new DataOutputStream(sock.getOutputStream)
    private val corr = new AtomicInteger(0)

    /** One synchronous request/response exchange. Flexible versions get
      * request header v2 (tags after client_id) and response header v1
      * (tags after the correlation id — except ApiVersions, pinned v0).
      */
    def request(apiKey: Int, apiVersion: Int)(write: Buf => Unit): Rd =
      synchronized {
        val id = corr.incrementAndGet()
        val b = new Buf(256)
        b.i16(apiKey); b.i16(apiVersion); b.i32(id); b.nstr(clientId)
        if (flexibleVersion(apiKey, apiVersion)) b.tags()
        write(b)
        val frame = b.result
        out.writeInt(frame.length); out.write(frame); out.flush()
        val size = in.readInt()
        val resp = new Array[Byte](size)
        in.readFully(resp)
        val r = new Rd(resp)
        val gotId = r.i32()
        require(gotId == id, s"correlation drift: sent $id got $gotId")
        if (flexibleVersion(apiKey, apiVersion) && apiKey != ApiVersions)
          r.tags()
        r
      }

    def close(): Unit = try sock.close() catch { case _: Throwable => () }
  }

  /** [[Broker.Transport]] over real Kafka frames. Each instance keeps
    * one connection per calling thread (real clients keep persistent
    * per-broker connections); `close()` tears them all down.
    */
  final class Client(host: String, port: Int, clientId: String = "graft",
                     produceCodec: Int = CodecNone,
                     protocol: String = "auto",
                     idempotent: Boolean = false,
                     saslPlain: Option[(String, String)] = None,
                     saslMechanism: String = "PLAIN",
                     isolation: String = "read_uncommitted",
                     transactionalId: Option[String] = None)
      extends Broker.Transport with Broker.RawBatchTransport {
    require(Set("auto", "legacy", "flexible")(protocol),
      s"protocol must be auto|legacy|flexible, got $protocol")
    require(Set("read_uncommitted", "read_committed")(isolation),
      s"isolation must be read_uncommitted|read_committed, got $isolation")
    // the fetch isolation byte (franz_reader.go:70's
    // transaction_isolation_level): 1 = read_committed — the broker
    // bounds the read at the LSO and withholds aborted records
    private val isolationByte: Int =
      if (isolation == "read_committed") 1 else 0
    private val conns = TrieMap.empty[Long, Conn]
    private def conn: Conn =
      conns.getOrElseUpdate(Thread.currentThread().getId, {
        val c = new Conn(host, port, clientId)
        // SASL is per-connection: every new socket authenticates before
        // it carries anything else, exactly as real clients do
        saslPlain.foreach { case (user, pass) =>
          try authenticate(c, user, pass)
          catch { case e: Throwable => c.close(); throw e }
        }
        c
      })
    def close(): Unit = { conns.values.foreach(_.close()); conns.clear() }

    /** SaslHandshake v1 then the mechanism's SaslAuthenticate v2
      * exchange: one round for PLAIN (RFC 4616), the client-first /
      * server-first / client-final / server-final conversation for
      * SCRAM-SHA-256 (RFC 5802/7677) — the client VERIFIES the server
      * signature, so a spoofed broker that doesn't know the password
      * fails the session even after answering error NONE.
      */
    private def authenticate(c: Conn, user: String, pass: String): Unit = {
      val rh = c.request(ApiSaslHandshake, 1)(b => b.str(saslMechanism))
      val herr = rh.i16()
      if (herr != ErrNone)
        throw new WireError(herr, s"SaslHandshake $saslMechanism")
      rh.array(rh.str()) // enabled mechanisms
      def round(payload: Array[Byte]): Array[Byte] = {
        val ra = c.request(ApiSaslAuthenticate, 2) { b =>
          b.cbytes(payload); b.tags()
        }
        val aerr = ra.i16()
        val msg = ra.cstr()
        val bytes = ra.cbytes()
        if (aerr != ErrNone)
          throw new WireError(aerr, s"SaslAuthenticate: $msg")
        bytes
      }
      saslMechanism match {
        case "PLAIN" =>
          round(("\u0000" + user + "\u0000" + pass).getBytes(UTF_8))
          ()
        case "SCRAM-SHA-256" =>
          val cnonce = Scram.nonce()
          val clientFirstBare = s"n=$user,r=$cnonce"
          val serverFirst =
            new String(round(("n,," + clientFirstBare).getBytes(UTF_8)), UTF_8)
          val a = serverFirst.split(",").iterator.filter(_.length >= 2)
            .map(kv => kv.substring(0, 1) -> kv.substring(2)).toMap
          val combined = a.getOrElse("r",
            throw new WireError(ErrSaslAuthenticationFailed,
              "server-first missing nonce"))
          require(combined.startsWith(cnonce),
            "scram: server nonce must extend the client nonce")
          val salted = Scram.saltedPassword(pass, Scram.unb64(a("s")),
            a("i").toInt)
          val clientKey = Scram.clientKey(salted)
          val withoutProof = s"c=biws,r=$combined"
          val authMessage =
            clientFirstBare + "," + serverFirst + "," + withoutProof
          val proof = Scram.xor(clientKey,
            Scram.hmac(Scram.sha256(clientKey), authMessage))
          val serverFinal = new String(round(
            (withoutProof + ",p=" + Scram.b64(proof)).getBytes(UTF_8)), UTF_8)
          val expected =
            "v=" + Scram.b64(Scram.hmac(Scram.serverKey(salted), authMessage))
          if (serverFinal != expected)
            throw new WireError(ErrSaslAuthenticationFailed,
              "scram: server signature mismatch (peer does not know the password)")
        case other =>
          throw new WireError(ErrUnsupportedSaslMechanism,
            s"client mechanism $other")
      }
    }

    def apiVersions(): Map[Int, (Int, Int)] = {
      val r = conn.request(ApiVersions, 0)(_ => ())
      val err = r.i16()
      require(err == ErrNone, s"ApiVersions error $err")
      r.array { (r.i16().toInt, (r.i16().toInt, r.i16().toInt)) }.toMap
    }

    /** One exchange at an EXPLICIT api version — the hook the wire spec
      * uses to drive every version inside the advertised ranges (the
      * broker must parse any intermediate version a real client
      * negotiates, not just this client's own two generations).
      */
    private[sources] def rawRequest(apiKey: Int, apiVersion: Int)
                                   (write: Buf => Unit): Rd =
      conn.request(apiKey, apiVersion)(write)

    /** Real-client negotiation: speak the flexible generation (Produce
      * v9 / Fetch v13 / Metadata v12) when the broker advertises it.
      * Computed once per client from ApiVersions (v0 request — the one
      * every broker generation parses).
      */
    private lazy val flexData: Boolean = protocol match {
      case "legacy" => false
      case "flexible" => true
      case _ => apiVersions().get(ApiProduce).exists(_._2 >= 9)
    }

    private val topicIdCache = TrieMap.empty[String, (Long, Long)]

    /** KIP-516 topic id via Metadata v12 (what fetch v13 addresses by). */
    private def topicIdOf(topic: String): (Long, Long) =
      topicIdCache.getOrElseUpdate(topic, {
        val r = conn.request(ApiMetadata, 12) { b =>
          b.carray(Seq(topic)) { t => b.uuid(0L, 0L); b.cnstr(t); b.tags() }
          b.i8(0); b.i8(0) // no auto-create, no authorized-ops
          b.tags()
        }
        r.i32() // throttle
        r.carray { r.i32(); r.cstr(); r.i32(); r.cstr(); r.tags() } // brokers
        r.cstr() // cluster_id
        r.i32()  // controller
        var id = (0L, 0L)
        r.carray {
          val err = r.i16(); r.cstr(); val tid = r.uuid(); r.i8()
          r.carray { r.i16(); r.i32(); r.i32(); r.i32()
            r.carray(r.i32()); r.carray(r.i32()); r.carray(r.i32()); r.tags() }
          r.i32() // topic_authorized_operations
          r.tags()
          if (err != ErrNone) throw new WireError(err, s"Metadata v12 $topic")
          id = tid
        }
        r.tags()
        id
      })

    override def createTopic(topic: String, partitions: Int): Unit = {
      val r = conn.request(ApiCreateTopics, 1) { b =>
        b.array(Seq(topic)) { t =>
          b.str(t); b.i32(partitions); b.i16(1)
          b.array(Seq.empty[Int])(_ => ()) // assignments
          b.array(Seq.empty[Int])(_ => ()) // configs
        }
        b.i32(10000)
      }
      r.array { r.str(); val err = r.i16()
        if (err != ErrNone && err != ErrTopicAlreadyExists)
          throw new WireError(err, s"CreateTopics $topic")
      }
      ()
    }

    /** topic → partition count via Metadata. */
    private def metadata(topicFilter: Seq[String]): Map[String, Int] = {
      val r = conn.request(ApiMetadata, 1) { b =>
        if (topicFilter.isEmpty) b.i32(-1)
        else b.array(topicFilter)(b.str)
      }
      r.array { r.i32(); r.str(); r.i32(); r.nstr() } // brokers
      r.i32() // controller
      r.array {
        val err = r.i16(); val name = r.str(); r.i8()
        val parts = r.array { r.i16(); r.i32(); r.i32()
          r.array(r.i32()); r.array(r.i32()); () }
        if (err != ErrNone) (name, -1) else (name, parts.size)
      }.filter(_._2 >= 0).toMap
    }

    override def listTopics(): Seq[String] = metadata(Nil).keys.toSeq.sorted

    def partitionCount(topic: String): Int =
      metadata(Seq(topic)).getOrElse(topic,
        throw new WireError(ErrUnknownTopicOrPartition, topic))

    def endOffset(topic: String, partition: Int): Long = {
      // a read_committed client plans against the LSO (ListOffsets v2+
      // carries the isolation level — KIP-98), so its offset ranges
      // never cross an open transaction
      val ver = if (isolationByte == 1) 2 else 1
      val r = conn.request(ApiListOffsets, ver) { b =>
        b.i32(-1)
        if (ver >= 2) b.i8(isolationByte)
        b.array(Seq(topic)) { t =>
          b.str(t)
          b.array(Seq(partition)) { p => b.i32(p); b.i64(-1L) }
        }
      }
      if (ver >= 2) r.i32() // throttle
      var result = -1L
      r.array { r.str(); r.array {
        r.i32(); val err = r.i16(); r.i64(); val off = r.i64()
        if (err != ErrNone) throw new WireError(err, s"ListOffsets $topic/$partition")
        result = off
      } }
      result
    }

    // ── idempotent produce (KIP-98, franz_writer.go:129's
    // `idempotent_write`): one InitProducerId per client, then every
    // batch carries (pid, epoch, baseSequence) with sequences advancing
    // per partition. The client is synchronous per thread, so at most
    // one request is in flight per partition — inside the protocol's
    // cap of 5 — and a send retry re-sends the SAME encoded bytes, so
    // the broker's sequence dedup makes the retry exactly-once (the
    // "retries only when safe" contract of franz_writer.go:101) ────────
    def initProducerId(transactionalId: String = null,
                       txnTimeoutMs: Int = 60000): (Long, Short) = {
      val ver = negotiated(ApiInitProducerId, 4, 0)
      val flex = ver >= 2
      val r = conn.request(ApiInitProducerId, ver) { b =>
        if (flex) b.cnstr(transactionalId) else b.nstr(transactionalId)
        b.i32(txnTimeoutMs) // transaction_timeout_ms
        if (ver >= 3) { b.i64(-1L); b.i16(-1) } // no KIP-360 re-init
        if (flex) b.tags()
      }
      r.i32() // throttle
      val err = r.i16()
      if (err != ErrNone) throw new WireError(err, "InitProducerId")
      (r.i64(), r.i16())
    }

    private lazy val producerSession: (Long, Short) = initProducerId()
    private val produceSeqs = TrieMap.empty[(String, Int), AtomicInteger]

    // ── transactional produce (KIP-98 EOS, the session shape of
    // franz-go's GroupTransactSession): one transaction per writer
    // TASK. Each Spark task owns one broker partition (brokerWrite's
    // one-reducer-per-partition contract) and runs on one thread, so
    // the session is a ThreadLocal: InitProducerId(tid) at begin —
    // which BUMPS the epoch, fencing any zombie from a failed attempt
    // of the same task — then lazy AddPartitionsToTxn per touched
    // partition, transactional data batches, and EndTxn commit/abort.
    // The tid is suffixed with the partition so concurrent tasks are
    // independent transactions, the same per-task tid scheme Kafka
    // Connect's exactly-once source tasks use. ──────────────────────
    private final class TxnSession(val tid: String, val pid: Long,
                                   val epoch: Short) {
      val seqs = mutable.Map.empty[(String, Int), Int]
      var parts = Set.empty[(String, Int)]
    }
    private val txnSession = new ThreadLocal[TxnSession]
    private[sources] def inTxn: Boolean = txnSession.get != null

    override def transactional[T](topic: String, partition: Int)
                                 (body: => T): T =
      transactionalId match {
        case None => body
        case Some(base) =>
          require(txnSession.get == null, "nested transaction")
          val tid = if (partition >= 0) s"$base-$partition" else base
          val (pid, epoch) = initProducerId(tid)
          val st = new TxnSession(tid, pid, epoch)
          txnSession.set(st)
          try {
            val out = body
            // a transaction that wrote nothing has nothing to end
            // (EndTxn on an empty txn is INVALID_TXN_STATE on a real
            // coordinator)
            if (st.parts.nonEmpty) endTxn(tid, pid, epoch, commit = true)
            out
          } catch {
            case e: Throwable =>
              // abort-on-task-failure: the broker writes abort markers
              // so read_committed consumers skip everything this
              // attempt produced; the retry's InitProducerId bumps the
              // epoch and re-produces from scratch
              if (st.parts.nonEmpty)
                try endTxn(tid, pid, epoch, commit = false)
                catch { case abortErr: Throwable => e.addSuppressed(abortErr) }
              throw e
          } finally txnSession.remove()
      }

    override def append(topic: String, partition: Int,
                        records: Seq[Broker.Record]): Long = {
      if (records.isEmpty) return endOffset(topic, partition)
      val stored = records.zipWithIndex.map { case (rec, i) =>
        Broker.Stored(partition, i.toLong, rec.key, rec.value, rec.headers,
          rec.timestampMs)
      }
      val st = txnSession.get
      if (st != null) {
        // inside this task's transaction: register the partition on
        // first touch, then produce transactional batches (attribute
        // bit 4) under the txn session's pid/epoch with per-partition
        // sequences — single-threaded by construction, no locking
        if (!st.parts((topic, partition))) {
          addPartitionsToTxn(st.tid, st.pid, st.epoch,
            Seq((topic, partition)))
          st.parts += ((topic, partition))
        }
        val baseSeq = st.seqs.getOrElse((topic, partition), 0)
        val batch = encodeBatch(stored, produceCodec, st.pid, st.epoch,
          baseSeq, attrsExtra = 0x10)
        val base = produceRecordSet(topic, partition, batch)
        st.seqs((topic, partition)) =
          ((baseSeq.toLong + records.size) % 0x80000000L).toInt
        base
      } else if (idempotent) {
        val (pid, epoch) = producerSession
        val slot = produceSeqs.getOrElseUpdate((topic, partition),
          new AtomicInteger(0))
        // sequence assignment and the send are one critical section per
        // partition: gapless sequences are the protocol's contract
        slot.synchronized {
          val baseSeq = slot.get()
          val batch = encodeBatch(stored, produceCodec, pid, epoch, baseSeq)
          val base = produceRecordSet(topic, partition, batch)
          slot.set(((baseSeq.toLong + records.size) % 0x80000000L).toInt)
          base
        }
      } else {
        produceRecordSet(topic, partition, encodeBatch(stored, produceCodec))
      }
    }

    /** One Fetch round: (error, highWatermark, rawRecordSet|null). */
    private def fetchOnce(topic: String, partition: Int,
                          cur: Long): (Short, Long, Array[Byte]) = {
      val hw = Long.MaxValue
      if (flexData) {
          val tid = topicIdOf(topic)
          val r = conn.request(ApiFetch, 13) { b =>
            b.i32(-1); b.i32(100); b.i32(1); b.i32(4 * 1024 * 1024)
            b.i8(isolationByte)
            b.i32(0); b.i32(-1) // session_id, session_epoch (sessionless)
            b.carray(Seq(topic)) { _ =>
              b.uuid(tid._1, tid._2)
              b.carray(Seq(partition)) { p =>
                b.i32(p); b.i32(-1); b.i64(cur); b.i32(-1); b.i64(0L)
                b.i32(1024 * 1024); b.tags()
              }
              b.tags()
            }
            b.carray(Seq.empty[Int])(_ => ()) // forgotten topics
            b.cstr("")                        // rack_id
            b.tags()
          }
          r.i32() // throttle
          val topErr = r.i16()
          if (topErr != ErrNone) throw new WireError(topErr, s"Fetch $topic")
          r.i32() // session_id
          var out0: (Short, Long, Array[Byte]) = (ErrNone, hw, null)
          r.carray { r.uuid(); r.carray {
            r.i32(); val err = r.i16(); val hwm = r.i64(); r.i64(); r.i64()
            val aborted = r.carray { r.i64(); r.i64(); r.tags() }
            require(aborted == null || aborted.isEmpty, "unexpected aborted txns")
            r.i32() // preferred_read_replica
            val recordSet = r.cbytes()
            r.tags()
            out0 = (err, hwm, recordSet)
          }; r.tags() }
          r.tags()
          out0
        } else {
          val r = conn.request(ApiFetch, 4) { b =>
            b.i32(-1); b.i32(100); b.i32(1); b.i32(4 * 1024 * 1024)
            b.i8(isolationByte)
            b.array(Seq(topic)) { t =>
              b.str(t)
              b.array(Seq(partition)) { p => b.i32(p); b.i64(cur); b.i32(1024 * 1024) }
            }
          }
          r.i32() // throttle
          var out0: (Short, Long, Array[Byte]) = (ErrNone, hw, null)
          r.array { r.str(); r.array {
            r.i32(); val err = r.i16(); val hwm = r.i64(); r.i64()
            val aborted = r.narray { r.i64(); r.i64() }
            require(aborted == null || aborted.isEmpty, "unexpected aborted txns")
            val recordSet = r.nbytes()
            out0 = (err, hwm, recordSet)
          } }
          out0
        }
    }

    override def fetch(topic: String, partition: Int, from: Long,
                       until: Long): Iterator[Broker.Stored] = {
      val out = ArrayBuffer.empty[Broker.Stored]
      var cur = from
      var hw = Long.MaxValue
      while (cur < until && cur < hw) {
        val (err, hwm, recordSet) = fetchOnce(topic, partition, cur)
        if (err != ErrNone) throw new WireError(err, s"Fetch $topic/$partition@$cur")
        hw = hwm
        var progressed = false
        if (recordSet != null && recordSet.nonEmpty) {
          val recs = decodeBatches(recordSet, partition, assignFrom = None)
            .filter(rec => rec.offset >= cur && rec.offset < until)
          if (recs.nonEmpty) {
            out ++= recs
            cur = recs.last.offset + 1
            progressed = true
          } else {
            // whole response below `from` can't happen (we asked at
            // cur); a batch entirely >= until means we're done
            cur = until
            progressed = true
          }
        }
        if (!progressed) cur = math.max(cur, math.min(until, hw))
      }
      out.iterator
    }

    /** Raw-batch read: one fetch round at `from`, returning the wire
      * record set verbatim plus its scanned record count and the high
      * watermark — the migrator's passthrough source.
      */
    override def fetchRawBatches(topic: String, partition: Int,
                                 from: Long): (Array[Byte], Int, Long) = {
      val (err, hw, recordSet) = fetchOnce(topic, partition, from)
      if (err != ErrNone)
        throw new WireError(err, s"Fetch $topic/$partition@$from")
      if (recordSet == null || recordSet.isEmpty)
        (Array.emptyByteArray, 0, hw)
      else {
        val scanned = scanBatchHeaders(recordSet)
        (recordSet, scanned.map(_.count).sum, hw)
      }
    }

    /** Raw-batch write: produce the wire record set verbatim (the
      * broker re-bases offsets by patching batch headers).
      */
    override def appendRawBatches(topic: String, partition: Int,
                                  recordSet: Array[Byte]): Long =
      produceRecordSet(topic, partition, recordSet)

    /** One produce exchange. When the client is idempotent, a broken
      * connection is retried ONCE on a fresh socket with the SAME bytes
      * — exactly-once because the broker dedupes on (pid, epoch,
      * sequence). Non-idempotent sends never retry: an ack lost on the
      * wire could otherwise duplicate records.
      */
    private def produceRecordSet(topic: String, partition: Int,
                                 recordSet: Array[Byte]): Long = {
      try produceOnce(topic, partition, recordSet)
      catch {
        // a transactional batch carries (pid, epoch, sequence) too, so
        // the same dedup makes its retry exactly-once
        case _: java.io.IOException if idempotent || inTxn =>
          conns.remove(Thread.currentThread().getId).foreach(_.close())
          produceOnce(topic, partition, recordSet)
      }
    }

    /** The produce request's transactional_id field: the open txn's id
      * on this thread, else null (idempotent/plain produce).
      */
    private def curTxnId: String =
      Option(txnSession.get).map(_.tid).orNull

    private def produceOnce(topic: String, partition: Int,
                            recordSet: Array[Byte]): Long = {
      var base = -1L
      if (flexData) {
        val r = conn.request(ApiProduce, 9) { b =>
          b.cnstr(curTxnId); b.i16(-1); b.i32(30000)
          b.carray(Seq(topic)) { t =>
            b.cstr(t)
            b.carray(Seq(partition)) { p =>
              b.i32(p); b.cnbytes(recordSet); b.tags() }
            b.tags()
          }
          b.tags()
        }
        r.carray { r.cstr(); r.carray {
          r.i32(); val err = r.i16(); val off = r.i64(); r.i64(); r.i64()
          r.carray { r.i32(); r.cstr(); r.tags() } // record_errors
          r.cstr() // error_message
          r.tags()
          if (err != ErrNone)
            throw new WireError(err, s"Produce $topic/$partition")
          base = off
        }; r.tags() }
        r.i32(); r.tags()
      } else {
        val r = conn.request(ApiProduce, 3) { b =>
          b.nstr(curTxnId); b.i16(-1); b.i32(30000)
          b.array(Seq(topic)) { t =>
            b.str(t)
            b.array(Seq(partition)) { p => b.i32(p); b.nbytes(recordSet) }
          }
        }
        r.array { r.str(); r.array {
          r.i32(); val err = r.i16(); val off = r.i64(); r.i64()
          if (err != ErrNone)
            throw new WireError(err, s"Produce $topic/$partition")
          base = off
        } }
      }
      base
    }

    override def commitGroupOffset(group: String, topic: String,
                                   partition: Int, offset: Long): Unit =
      commitOffsets(group, -1, "", Map((topic, partition) -> offset))

    // ── group/control plane at NEGOTIATED versions (r15) ──────────────
    // A real client speaks the highest version both sides support;
    // `protocol="legacy"` pins the sarama-era floor so both request
    // generations stay exercised through the same client code path.
    private lazy val advertisedVersions: Map[Int, (Int, Int)] = apiVersions()
    private def negotiated(api: Int, ourMax: Int, legacyPin: Int): Int =
      if (protocol == "legacy") legacyPin
      else advertisedVersions.get(api) match {
        case None => legacyPin
        case Some((lo, hi)) =>
          // this client encodes versions [legacyPin, ourMax]; a broker
          // range that does not overlap it cannot be spoken — fail
          // loudly instead of emitting a frame the other side (or this
          // one) would misparse (ADVICE r15)
          if (lo > ourMax || hi < legacyPin)
            throw new WireError(ErrUnsupportedVersion,
              s"api $api: broker advertises [$lo,$hi], client implements " +
              s"[$legacyPin,$ourMax] — no overlap")
          math.max(lo, math.min(hi, ourMax))
      }

    def commitOffsets(group: String, generation: Int, memberId: String,
                      offsets: Map[(String, Int), Long]): Unit = {
      val ver = negotiated(ApiOffsetCommit, 8, 2)
      val flex = ver >= 8
      val byTopic = offsets.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      val r = conn.request(ApiOffsetCommit, ver) { b =>
        if (flex) {
          b.cstr(group); b.i32(generation); b.cstr(memberId); b.cnstr(null)
          b.carray(byTopic) { case (t, parts) =>
            b.cstr(t)
            b.carray(parts) { case ((_, p), off) =>
              b.i32(p); b.i64(off); b.i32(-1); b.cnstr(null); b.tags()
            }
            b.tags()
          }
          b.tags()
        } else {
          b.str(group); b.i32(generation); b.str(memberId)
          if (ver >= 7) b.nstr(null) // group_instance_id
          if (ver <= 4) b.i64(-1L) // retention_time_ms (pre-KIP-211)
          b.array(byTopic) { case (t, parts) =>
            b.str(t)
            b.array(parts) { case ((_, p), off) =>
              b.i32(p); b.i64(off)
              if (ver >= 6) b.i32(-1) // committed_leader_epoch
              b.nstr(null)
            }
          }
        }
      }
      if (ver >= 3) r.i32() // throttle
      def checkPart(): Unit = {
        r.i32(); val err = r.i16()
        if (err != ErrNone) throw new WireError(err, s"OffsetCommit $group")
      }
      if (flex) {
        r.carray { r.cstr(); r.carray { checkPart(); r.tags() }; r.tags() }
        r.tags()
      } else r.array { r.str(); r.array(checkPart()) }
      ()
    }

    override def committedOffsets(group: String): Seq[(String, Int, Long)] = {
      val ver = negotiated(ApiOffsetFetch, 7, 2)
      val flex = ver >= 6
      val r = conn.request(ApiOffsetFetch, ver) { b =>
        if (flex) {
          b.cstr(group); b.cnarrayNull() // null topics = all
          if (ver >= 7) b.i8(0) // require_stable
          b.tags()
        } else { b.str(group); b.i32(-1) }
      }
      if (ver >= 3) r.i32() // throttle
      val out = ArrayBuffer.empty[(String, Int, Long)]
      if (flex) {
        r.carray { val t = r.cstr(); r.carray {
          val p = r.i32(); val off = r.i64(); r.i32(); r.cstr()
          val err = r.i16(); r.tags()
          if (err == ErrNone && off >= 0) out += ((t, p, off))
        }; r.tags() }
        // coordinator-level error (e.g. COORDINATOR_LOAD_IN_PROGRESS)
        // must fail the call, not silently yield a partial offset list
        // (ADVICE r15)
        val topErr = r.i16(); r.tags()
        if (topErr != ErrNone)
          throw new WireError(topErr, s"OffsetFetch $group")
      } else {
        r.array { val t = r.str(); r.array {
          val p = r.i32(); val off = r.i64()
          if (ver >= 5) r.i32() // committed_leader_epoch
          r.nstr(); val err = r.i16()
          if (err == ErrNone && off >= 0) out += ((t, p, off))
        } }
        // the non-flexible top-level error exists from v2 (this
        // client's floor)
        val topErr = r.i16()
        if (topErr != ErrNone)
          throw new WireError(topErr, s"OffsetFetch $group")
      }
      out.toVector.sortBy(x => (x._1, x._2))
    }

    def findCoordinator(group: String): (String, Int) = {
      val ver = negotiated(ApiFindCoordinator, 3, 0)
      val flex = ver >= 3
      val r = conn.request(ApiFindCoordinator, ver) { b =>
        if (flex) b.cstr(group) else b.str(group)
        if (ver >= 1) b.i8(0) // key_type = group
        if (flex) b.tags()
      }
      if (ver >= 1) r.i32() // throttle
      val err = r.i16()
      if (err != ErrNone) throw new WireError(err, s"FindCoordinator $group")
      if (ver >= 1) { if (flex) r.cstr() else r.nstr() } // error_message
      r.i32() // node_id
      val host = if (flex) r.cstr() else r.str()
      (host, r.i32())
    }

    def joinGroup(group: String, memberId: String, topics: Seq[String],
                  rebalanceTimeoutMs: Int = 10000)
        : (Int, String, String, Seq[(String, Seq[String])]) = {
      val ver = negotiated(ApiJoinGroup, 9, 2)
      val flex = ver >= 6
      val meta = encodeSubscription(topics)
      val r = conn.request(ApiJoinGroup, ver) { b =>
        if (flex) {
          b.cstr(group); b.i32(30000); b.i32(rebalanceTimeoutMs)
          b.cstr(memberId)
          if (ver >= 5) b.cnstr(null) // group_instance_id
          b.cstr("consumer")
          b.carray(Seq("range")) { n => b.cstr(n); b.cbytes(meta); b.tags() }
          if (ver >= 8) b.cnstr(null) // reason
          b.tags()
        } else {
          b.str(group); b.i32(30000); b.i32(rebalanceTimeoutMs)
          b.str(memberId)
          if (ver >= 5) b.nstr(null)
          b.str("consumer")
          b.array(Seq("range")) { name => b.str(name); b.bytes(meta) }
        }
      }
      r.i32() // throttle
      val err = r.i16()
      val gen = r.i32()
      if (ver >= 7) { if (flex) r.cstr() else r.nstr() } // protocol_type
      if (flex) r.cstr() else r.str() // protocol_name
      val leader = if (flex) r.cstr() else r.str()
      if (ver >= 9) r.i8() // skip_assignment
      val me = if (flex) r.cstr() else r.str()
      val members =
        if (flex) r.carray {
          val m = r.cstr(); r.cstr(); val mm = r.cbytes(); r.tags()
          (m, decodeSubscription(mm))
        } else r.array {
          val m = r.str()
          if (ver >= 5) r.nstr()
          (m, decodeSubscription(r.bytes()))
        }
      if (flex) r.tags()
      if (err == ErrMemberIdRequired && memberId.isEmpty && me.nonEmpty)
        // KIP-394: rejoin with the broker-issued member id
        joinGroup(group, me, topics, rebalanceTimeoutMs)
      else if (err != ErrNone) throw new WireError(err, s"JoinGroup $group")
      else (gen, leader, me, members)
    }

    def syncGroup(group: String, generation: Int, memberId: String,
                  assignments: Seq[(String, Map[String, Seq[Int]])])
        : Map[String, Seq[Int]] = {
      val ver = negotiated(ApiSyncGroup, 5, 1)
      val flex = ver >= 4
      val r = conn.request(ApiSyncGroup, ver) { b =>
        if (flex) {
          b.cstr(group); b.i32(generation); b.cstr(memberId)
          if (ver >= 3) b.cnstr(null)
          if (ver >= 5) { b.cnstr("consumer"); b.cnstr("range") }
          b.carray(assignments) { case (m, a) =>
            b.cstr(m); b.cbytes(encodeAssignment(a)); b.tags()
          }
          b.tags()
        } else {
          b.str(group); b.i32(generation); b.str(memberId)
          if (ver >= 3) b.nstr(null)
          b.array(assignments) { case (m, a) =>
            b.str(m); b.bytes(encodeAssignment(a))
          }
        }
      }
      r.i32() // throttle
      val err = r.i16()
      if (err != ErrNone) throw new WireError(err, s"SyncGroup $group")
      if (ver >= 5) { r.cstr(); r.cstr() } // protocol_type/name echo
      decodeAssignment(if (flex) r.cbytes() else r.bytes())
    }

    def heartbeat(group: String, generation: Int, memberId: String): Short = {
      val ver = negotiated(ApiHeartbeat, 4, 1)
      val flex = ver >= 4
      val r = conn.request(ApiHeartbeat, ver) { b =>
        if (flex) {
          b.cstr(group); b.i32(generation); b.cstr(memberId)
          b.cnstr(null); b.tags()
        } else {
          b.str(group); b.i32(generation); b.str(memberId)
          if (ver >= 3) b.nstr(null)
        }
      }
      r.i32(); r.i16()
    }

    def leaveGroup(group: String, memberId: String): Unit = {
      val ver = negotiated(ApiLeaveGroup, 5, 1)
      val flex = ver >= 4
      val r = conn.request(ApiLeaveGroup, ver) { b =>
        if (flex) {
          b.cstr(group)
          b.carray(Seq(memberId)) { m =>
            b.cstr(m); b.cnstr(null)
            if (ver >= 5) b.cnstr(null) // reason
            b.tags()
          }
          b.tags()
        } else if (ver >= 3) {
          b.str(group)
          b.array(Seq(memberId)) { m => b.str(m); b.nstr(null) }
        } else { b.str(group); b.str(memberId) }
      }
      r.i32(); r.i16()
      ()
    }

    /** ListGroups at the negotiated version — the migrator's
      * source-side group discovery (migrator_groups.go reads the same
      * API through franz-go's admin client).
      */
    override def listGroups(): Seq[String] = {
      val ver = negotiated(ApiListGroups, 4, 0)
      val flex = ver >= 3
      val r = conn.request(ApiListGroups, ver) { b =>
        if (ver >= 4) b.carray(Seq.empty[String])(_ => ()) // all states
        if (flex) b.tags()
      }
      if (ver >= 1) r.i32() // throttle
      val err = r.i16()
      if (err != ErrNone) throw new WireError(err, "ListGroups")
      val out =
        if (flex) r.carray {
          val g = r.cstr(); r.cstr() // protocol_type
          if (ver >= 4) r.cstr()     // group_state
          r.tags(); g
        } else r.array { val g = r.str(); r.str(); g }
      if (flex) r.tags()
      out.sorted
    }

    /** DescribeGroups: (group, publicState, protocolType, memberIds). */
    def describeGroups(groupIds: Seq[String])
        : Seq[(String, String, String, Seq[String])] = {
      val ver = negotiated(ApiDescribeGroups, 5, 0)
      val flex = ver >= 5
      val r = conn.request(ApiDescribeGroups, ver) { b =>
        if (flex) b.carray(groupIds)(b.cstr) else b.array(groupIds)(b.str)
        if (ver >= 3) b.i8(0) // include_authorized_operations
        if (flex) b.tags()
      }
      if (ver >= 1) r.i32() // throttle
      def rstr(): String = if (flex) r.cstr() else r.str()
      def one(): (String, String, String, Seq[String]) = {
        val err = r.i16()
        val gid = rstr(); val state = rstr(); val pt = rstr(); rstr() // protocol_data
        val members =
          if (flex) r.carray {
            val m = r.cstr(); r.cstr() // group_instance_id (v4+≡flex here)
            r.cstr(); r.cstr(); r.cbytes(); r.cbytes(); r.tags(); m
          } else r.array {
            val m = r.str()
            if (ver >= 4) r.nstr()
            r.str(); r.str(); r.bytes(); r.bytes(); m
          }
        if (ver >= 3) r.i32() // authorized_operations
        if (flex) r.tags()
        if (err != ErrNone) throw new WireError(err, s"DescribeGroups $gid")
        (gid, state, pt, members)
      }
      val out = if (flex) r.carray(one()) else r.array(one())
      if (flex) r.tags()
      out
    }

    /** DeleteTopics at the negotiated version (v6 sends the KIP-516
      * name+id struct). Unknown topics throw.
      */
    def deleteTopics(names: Seq[String]): Unit = {
      val ver = negotiated(ApiDeleteTopics, 6, 1)
      val flex = ver >= 4
      val r = conn.request(ApiDeleteTopics, ver) { b =>
        if (ver >= 6) b.carray(names) { n =>
          b.cnstr(n); b.uuid(0L, 0L); b.tags()
        }
        else if (flex) b.carray(names)(b.cstr)
        else b.array(names)(b.str)
        b.i32(10000) // timeout_ms
        if (flex) b.tags()
      }
      if (ver >= 1) r.i32() // throttle
      def one(): Unit = {
        val name = if (ver >= 6) { if (flex) r.cstr() else r.nstr() }
                   else if (flex) r.cstr() else r.str()
        if (ver >= 6) r.uuid()
        val err = r.i16()
        if (ver >= 5) r.cstr() // error_message
        if (flex) r.tags()
        if (err != ErrNone) throw new WireError(err, s"DeleteTopics $name")
      }
      if (flex) { r.carray(one()); r.tags() } else r.array(one())
      ()
    }

    /** AddPartitionsToTxn at the negotiated version: register the
      * partitions this producer's open transaction will write.
      */
    def addPartitionsToTxn(transactionalId: String, pid: Long, epoch: Short,
                           parts: Seq[(String, Int)]): Unit = {
      val ver = negotiated(ApiAddPartitionsToTxn, 3, 0)
      val flex = ver >= 3
      val byTopic = parts.groupBy(_._1).toSeq.sortBy(_._1)
      val r = conn.request(ApiAddPartitionsToTxn, ver) { b =>
        if (flex) b.cstr(transactionalId) else b.str(transactionalId)
        b.i64(pid); b.i16(epoch)
        if (flex) {
          b.carray(byTopic) { case (t, ps) =>
            b.cstr(t); b.carray(ps.map(_._2))(b.i32); b.tags()
          }
          b.tags()
        } else b.array(byTopic) { case (t, ps) =>
          b.str(t); b.array(ps.map(_._2))(b.i32)
        }
      }
      r.i32() // throttle
      def one(): Unit = {
        r.i32(); val err = r.i16()
        if (flex) r.tags()
        if (err != ErrNone)
          throw new WireError(err, s"AddPartitionsToTxn $transactionalId")
      }
      if (flex) {
        r.carray { r.cstr(); r.carray(one()); r.tags() }; r.tags()
      } else r.array { r.str(); r.array(one()) }
      ()
    }

    /** EndTxn at the negotiated version: commit or abort. */
    def endTxn(transactionalId: String, pid: Long, epoch: Short,
               commit: Boolean): Unit = {
      val ver = negotiated(ApiEndTxn, 3, 0)
      val flex = ver >= 3
      val r = conn.request(ApiEndTxn, ver) { b =>
        if (flex) b.cstr(transactionalId) else b.str(transactionalId)
        b.i64(pid); b.i16(epoch); b.i8(if (commit) 1 else 0)
        if (flex) b.tags()
      }
      r.i32() // throttle
      val err = r.i16()
      if (err != ErrNone)
        throw new WireError(err, s"EndTxn $transactionalId")
    }
  }

  // ── ConsumerProtocol subscription/assignment (public format) ────────

  private def encodeSubscription(topics: Seq[String]): Array[Byte] = {
    val b = new Buf(64)
    b.i16(0) // version
    b.array(topics)(b.str)
    b.bytes(Array.empty[Byte]) // user data
    b.result
  }

  private def decodeSubscription(bytes: Array[Byte]): Seq[String] = {
    val r = new Rd(bytes)
    r.i16()
    r.array(r.str())
  }

  private def encodeAssignment(a: Map[String, Seq[Int]]): Array[Byte] = {
    val b = new Buf(64)
    b.i16(0)
    b.array(a.toSeq.sortBy(_._1)) { case (t, ps) =>
      b.str(t); b.array(ps)(b.i32)
    }
    b.bytes(Array.empty[Byte])
    b.result
  }

  private def decodeAssignment(bytes: Array[Byte]): Map[String, Seq[Int]] = {
    if (bytes.isEmpty) return Map.empty
    val r = new Rd(bytes)
    r.i16()
    r.array { (r.str(), r.array(r.i32())) }.toMap
  }

  /** Range assignment (the consumer default): per topic, partitions
    * chunked across members sorted by id — computed CLIENT-side by the
    * group leader, as real consumers do.
    */
  def rangeAssign(members: Seq[(String, Seq[String])],
                  partitionsOf: String => Int)
      : Seq[(String, Map[String, Seq[Int]])] = {
    val byTopic = members.flatMap { case (m, ts) => ts.map(_ -> m) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val out = mutable.Map.empty[String, mutable.Map[String, Seq[Int]]]
    members.foreach { case (m, _) => out(m) = mutable.Map.empty }
    byTopic.foreach { case (topic, ms) =>
      val n = partitionsOf(topic)
      val per = n / ms.size
      val extra = n % ms.size
      var start = 0
      ms.zipWithIndex.foreach { case (m, i) =>
        val take = per + (if (i < extra) 1 else 0)
        if (take > 0) out(m)(topic) = (start until start + take).toVector
        start += take
      }
    }
    out.toSeq.map { case (m, a) => (m, a.toMap) }.sortBy(_._1)
  }

  /** One consumer-group session: coordinator discovery → join → (leader
    * computes range assignment) → sync. The session's assignment +
    * generation then drive partition-parallel fetches and offset
    * commits.
    */
  final class GroupMember(host: String, port: Int, group: String,
                          topics: Seq[String]) {
    val client = new Client(host, port)
    private var memberId = ""
    private var gen = 0
    private var assigned: Map[String, Seq[Int]] = Map.empty
    def generation: Int = gen
    def assignment: Map[String, Seq[Int]] = assigned

    def join(): Map[String, Seq[Int]] = {
      val (coordHost, coordPort) = client.findCoordinator(group)
      require(coordHost.nonEmpty && coordPort > 0, "no coordinator")
      val (g, leader, me, members) = client.joinGroup(group, memberId, topics)
      gen = g; memberId = me
      val assignments =
        if (me == leader) rangeAssign(members, client.partitionCount)
        else Seq.empty
      assigned = client.syncGroup(group, gen, memberId, assignments)
      assigned
    }

    def heartbeat(): Short = client.heartbeat(group, gen, memberId)
    def commit(offsets: Map[(String, Int), Long]): Unit =
      client.commitOffsets(group, gen, memberId, offsets)
    def committed(): Map[(String, Int), Long] =
      client.committedOffsets(group)
        .map { case (t, p, o) => (t, p) -> o }.toMap
    def leave(): Unit = { client.leaveGroup(group, memberId); memberId = "" }
    def close(): Unit = client.close()
  }

  /** Per-address client cache so executor tasks resolve `kafka://`
    * addresses to a live connection pool by name (the same
    * registry-by-name shape as [[Broker.InMemory.named]]).
    */
  private val clients = TrieMap.empty[String, Client]
  /** `host:port` with optional query options:
    * `compression=gzip|snappy|lz4|zstd` sets the producer-side batch
    * codec; `idempotent=true` enables the idempotent producer
    * (InitProducerId + per-partition sequences — the kafka output's
    * `idempotent_write`, on by default like franz-go's);
    * `sasl_user=…&sasl_pass=…` (URL-encoded) authenticates every
    * connection with SASL PLAIN — the connector `sasl` config block;
    * `transactional_id=…` makes each writer task's produce a KIP-98
    * transaction (AddPartitionsToTxn → produce → EndTxn, abort on
    * task failure) — the kafka output's `transactional_id`.
    */
  def clientFor(hostPort: String): Client =
    clients.getOrElseUpdate(hostPort, {
      val (hp, codec, idem, sasl, iso, txnId) =
        hostPort.split("\\?", 2) match {
          case Array(a) => (a, CodecNone, false, None, "read_uncommitted",
            None)
          case Array(a, q) =>
            val kvs = q.split("&").toSeq
            val c = kvs.collectFirst {
              case kv if kv.startsWith("compression=") =>
                codecId(kv.stripPrefix("compression="))
            }.getOrElse(CodecNone)
            def qv(k: String): Option[String] = kvs.collectFirst {
              case kv if kv.startsWith(k + "=") =>
                java.net.URLDecoder.decode(kv.stripPrefix(k + "="), "UTF-8")
            }
            val s = for (u <- qv("sasl_user"); p <- qv("sasl_pass"))
              yield (u, p)
            (a, c, kvs.contains("idempotent=true"),
              s.map(cred => (cred, qv("sasl_mechanism").getOrElse("PLAIN"))),
              qv("isolation").getOrElse("read_uncommitted"),
              qv("transactional_id").filter(_.nonEmpty))
        }
      val Array(h, p) = hp.split(":", 2)
      new Client(h, p.toInt, produceCodec = codec, idempotent = idem,
        saslPlain = sasl.map(_._1),
        saslMechanism = sasl.map(_._2).getOrElse("PLAIN"),
        isolation = iso,
        transactionalId = txnId)
    })
  def dropClient(hostPort: String): Unit = {
    clients.remove(hostPort).foreach(_.close())
  }
}
