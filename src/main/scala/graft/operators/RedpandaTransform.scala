package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

import graft.sources.Envelope
import graft.wasm.{WasmInterp, WasmModule}
import graft.wasm.WasmInterp.{HostFn, Instance, Trap}

/** The `redpanda_data_transform` processor (reference
  * internal/impl/redpanda/processor_data_transform.go:88,
  * functions.go:35-150, serde.go — contract only: the reference embeds
  * wazero; this runs graft's own interpreter, `graft.wasm`).
  *
  * Guest ABI — the host module `redpanda_transform` exports:
  *
  *  - `check_abi_version_1` / `check_abi_version_2` — no-ops
  *  - `read_batch_header(_, recordCountPtr, _ ×8) -> i32` — stages the
  *    next batch: writes the record count to `recordCountPtr` and
  *    returns the longest serialized record size (the guest's buffer
  *    bound), or -1 (`noActiveTransform`) when the stream is done
  *  - `read_next_record(attrsPtr, tsPtr, offsetPtr, dataPtr, dataLen)
  *    -> i32` — serializes one record into guest memory, returns its
  *    length (-1 past the batch end, -2 on a short buffer). The
  *    reference writes the offset over the timestamp slot
  *    (functions.go:100 writes both WriteUint64Le calls to `timestamp`)
  *    — a quirk its SDKs tolerate because they ignore both; here the
  *    offset goes to `offsetPtr` as the field names intend.
  *  - `write_record(dataPtr, dataLen) -> i32` — deserializes an output
  *    record and appends it to the output batch
  *  - `write_record_with_options(dataPtr, dataLen, optsPtr, optsLen)`
  *    — same plus an options blob carrying the output topic (key 0x01;
  *    the reference reads the options from `dataPtr` — functions.go:146
  *    — and then drops the record entirely; here the declared pointers
  *    are honored and the record is emitted)
  *
  * Record serde (serde.go:29-130): Go `binary.PutVarint` zigzag
  * varints — `sized(key)` (nil = -1), `sized(value)`, `varint(#headers)`,
  * then per header `sized(keyUtf8)` + `sized(value)`.
  *
  * Execution model: the reference parks the guest inside
  * `read_batch_header` on a channel between batches (one OS thread per
  * instance). A Spark task is single-threaded, so the equivalent here
  * is per-CHUNK re-entry: each partition chunk is staged, `_start` is
  * invoked, the first `read_batch_header` returns the chunk and the
  * second returns -1 → the guest's poll loop exits and `_start`
  * returns; module state (memory, globals) persists across chunks
  * exactly like the reference's pooled module runners. Memory stays
  * bounded by the chunk size, not the partition.
  *
  * Scale shape: module decodes once on the driver (fail fast), binary
  * rides the closure, `mapPartitions` per-partition instances — no
  * shuffle, no driver involvement. Record counts may change (a guest
  * may filter or fan out), so the output is envelope-shaped
  * (value/metadata/error) rather than row-preserving.
  */
object RedpandaTransform {

  private final val NoActiveTransform = -1L
  private final val InvalidBuffer = -2L

  /** One staged input record, pre-serialized (serde.go:108). */
  private final case class TMsg(bytes: Array[Byte], timestamp: Long,
                                offset: Long)

  /** One deserialized output record. */
  final case class OutRecord(key: Array[Byte], value: Array[Byte],
                             headers: Seq[(String, Array[Byte])],
                             outputTopic: Option[String])

  // ── Go binary.PutVarint / Varint (zigzag LEB128) ──────────────────
  private def putVarint(out: mutable.ArrayBuilder[Byte], v: Long): Unit = {
    var u = (v << 1) ^ (v >> 63)
    while ((u & ~0x7fL) != 0) { out += ((u & 0x7f) | 0x80).toByte; u >>>= 7 }
    out += u.toByte
  }
  private def putSized(out: mutable.ArrayBuilder[Byte], b: Array[Byte]): Unit =
    if (b == null) putVarint(out, -1L)
    else { putVarint(out, b.length.toLong); out ++= b }

  /** Returns (value, bytesRead); bytesRead = 0 signals bad data. */
  private def varint(b: Array[Byte], pos: Int): (Long, Int) = {
    var u = 0L; var shift = 0; var i = pos
    while (i < b.length) {
      val x = b(i) & 0xff
      u |= (x & 0x7fL) << shift
      i += 1
      if ((x & 0x80) == 0) {
        val v = (u >>> 1) ^ -(u & 1)
        return (v, i - pos)
      }
      shift += 7
      if (shift > 63) return (0L, 0)
    }
    (0L, 0)
  }
  private def readSized(b: Array[Byte], pos: Int): (Array[Byte], Int) = {
    val (n, amt) = varint(b, pos)
    if (amt == 0) return (null, 0)
    if (n < 0) return (null, amt) // nil marker
    val start = pos + amt
    if (n > b.length - start) return (null, 0)
    (java.util.Arrays.copyOfRange(b, start, start + n.toInt), amt + n.toInt)
  }

  private def serialize(key: Array[Byte], value: Array[Byte],
                        headers: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = mutable.ArrayBuilder.make[Byte]
    putSized(out, key)
    putSized(out, value)
    putVarint(out, headers.length.toLong)
    headers.foreach { case (k, v) =>
      putSized(out, k.getBytes("UTF-8")); putSized(out, v)
    }
    out.result()
  }

  private def deserialize(b: Array[Byte]): Option[OutRecord] = {
    val (key, n1) = readSized(b, 0)
    if (n1 == 0) return None
    val (value, n2) = readSized(b, n1)
    if (n2 == 0) return None
    val (nHdr, n3) = varint(b, n1 + n2)
    if (n3 == 0 || nHdr < 0) return None
    var pos = n1 + n2 + n3
    val hdrs = Seq.newBuilder[(String, Array[Byte])]
    var i = 0L
    while (i < nHdr) {
      val (hk, a) = readSized(b, pos)
      if (a == 0 || hk == null) return None
      pos += a
      val (hv, c) = readSized(b, pos)
      if (c == 0) return None
      pos += c
      hdrs += ((new String(hk, "UTF-8"), if (hv == null) Array.emptyByteArray else hv))
      i += 1
    }
    Some(OutRecord(key, if (value == null) Array.emptyByteArray else value,
      hdrs.result(), None))
  }

  /** One instantiated module; feed chunks via [[run]]. NOT thread-safe
    * (one per partition, like the reference's module pool).
    */
  final class Engine(moduleBytes: Array[Byte], maxMemoryPages: Int = 1024) {
    private var staged: Array[TMsg] = Array.empty
    private var served = false
    private var recIdx = 0
    private val outBuf = mutable.ArrayBuffer.empty[OutRecord]
    var procErr: String = null

    private def fail(msg: String): Long = {
      if (procErr == null) procErr = msg
      InvalidBuffer
    }

    private val hostFns: Map[(String, String), HostFn] = {
      def h(name: String)(fn: Array[Long] => Long): ((String, String), HostFn) =
        ("redpanda_transform", name) -> { args: Array[Long] => Array(fn(args)) }
      def hv(name: String): ((String, String), HostFn) =
        ("redpanda_transform", name) -> { _: Array[Long] => Array.empty[Long] }
      Map(
        hv("check_abi_version_1"),
        hv("check_abi_version_2"),
        h("read_batch_header") { args =>
          if (served || staged.isEmpty) NoActiveTransform
          else {
            served = true
            recIdx = 0
            val countPtr = args(1).toInt
            instance.writeBytes(countPtr, leU32(staged.length))
            staged.iterator.map(_.bytes.length).max.toLong
          }
        },
        h("read_next_record") { args =>
          if (recIdx >= staged.length) NoActiveTransform
          else {
            val Array(attrsPtr, tsPtr, offPtr, dataPtr, dataLen) =
              args.map(_.toInt)
            val msg = staged(recIdx)
            if (msg.bytes.length > dataLen) fail(
              s"record ${msg.bytes.length}B exceeds guest buffer ${dataLen}B")
            else {
              instance.writeBytes(attrsPtr, Array[Byte](0))
              instance.writeBytes(tsPtr, leU64(msg.timestamp))
              instance.writeBytes(offPtr, leU64(msg.offset))
              instance.writeBytes(dataPtr, msg.bytes)
              recIdx += 1
              msg.bytes.length.toLong
            }
          }
        },
        h("write_record") { args =>
          val buf = instance.readBytes(args(0).toInt, args(1).toInt)
          deserialize(buf) match {
            case Some(r) => outBuf += r; buf.length.toLong
            case None => fail("undecodable output record")
          }
        },
        h("write_record_with_options") { args =>
          val buf = instance.readBytes(args(0).toInt, args(1).toInt)
          val opts = instance.readBytes(args(2).toInt, args(3).toInt)
          deserialize(buf) match {
            case Some(r) =>
              val topic =
                if (opts.isEmpty || opts(0) != 0x01) None
                else readSized(opts, 1) match {
                  case (t, n) if n > 0 && t != null =>
                    Some(new String(t, "UTF-8"))
                  case _ => None
                }
              outBuf += r.copy(outputTopic = topic)
              buf.length.toLong
            case None => fail("undecodable output record")
          }
        })
    }

    private val instance: Instance =
      new Instance(WasmModule.decode(moduleBytes), hostFns = hostFns,
        maxMemoryPages = maxMemoryPages)
    private val startFn = instance.exportedFunction("_start").getOrElse(
      throw new WasmInterp.LinkError("_start function is required"))

    def validate(): Unit = ()

    /** Run one chunk through the guest; returns the output records. */
    def run(chunk: Array[TMsgIn]): Seq[OutRecord] = {
      staged = chunk.map(m =>
        TMsg(serialize(m.key, m.value, m.headers), m.timestamp, m.offset))
      served = false
      outBuf.clear()
      procErr = null
      try startFn(Array.empty)
      catch {
        case t: Trap => if (procErr == null) procErr = t.getMessage
      }
      outBuf.toSeq
    }
  }

  /** Host-side input record prior to serialization. */
  final case class TMsgIn(key: Array[Byte], value: Array[Byte],
                          headers: Seq[(String, Array[Byte])],
                          timestamp: Long, offset: Long)

  private def leU32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def leU64(v: Long): Array[Byte] = {
    val a = new Array[Byte](8)
    var i = 0
    while (i < 8) { a(i) = (v >>> (8 * i)).toByte; i += 1 }
    a
  }

  val OutputTopicMeta = "data_transform_output_topic"

  /** The processor. Config mirrors the reference's fields
    * (processor_data_transform.go:60): `input_key_meta` names a
    * metadata key whose value becomes the record key; `output_key_meta`
    * names the metadata key to carry the output record's key;
    * `timestamp_meta` names a metadata key holding epoch-millis (unset
    * = wall clock, matching the reference's `time.Now()` default).
    * Output is envelope-shaped; headers written by the guest land in
    * `metadata`, and `write_record_with_options` topics land in
    * `data_transform_output_topic`.
    */
  def processor(df0: DataFrame, moduleBytes: Array[Byte],
                inputKeyMeta: Option[String] = None,
                outputKeyMeta: Option[String] = None,
                timestampMeta: Option[String] = None,
                batchSize: Int = 256): DataFrame = {
    // driver-side fail-fast: decode + link + resolve _start once
    new Engine(moduleBytes).validate()

    val df = Envelope.ensure(df0)
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val mIdx = schema.fieldIndex(Envelope.MetadataCol)
    val bytes = moduleBytes
    val outSchema = StructType(Seq(
      StructField(Envelope.ValueCol, StringType),
      StructField(Envelope.MetadataCol, MapType(StringType, StringType)),
      StructField(Envelope.ErrorCol, StringType)))

    df.mapPartitions { rows =>
      val engine = new Engine(bytes)
      var offset = 0L
      rows.grouped(batchSize).flatMap { chunk =>
        val staged = chunk.map { row =>
          val value = Option(row.getString(vIdx))
            .map(_.getBytes("UTF-8")).getOrElse(Array.emptyByteArray)
          val meta = Option(row.getMap[String, String](mIdx))
            .map(_.toSeq).getOrElse(Seq.empty)
          val key = inputKeyMeta.flatMap(k => meta.collectFirst {
            case (mk, mv) if mk == k => mv.getBytes("UTF-8") }).orNull
          val ts = timestampMeta.flatMap(k => meta.collectFirst {
            case (mk, mv) if mk == k => mv.toLong
          }).getOrElse(System.currentTimeMillis())
          val o = offset
          offset += 1
          TMsgIn(key, value,
            meta.map { case (k, v) => (k, v.getBytes("UTF-8")) }, ts, o)
        }.toArray
        val out = engine.run(staged)
        val err = engine.procErr
        if (err != null && out.isEmpty)
          // whole-chunk failure surfaces once on the error channel
          Seq(Row(null, Map.empty[String, String], s"redpanda_data_transform: $err"))
        else out.map { r =>
          val meta = mutable.LinkedHashMap.empty[String, String]
          r.headers.foreach { case (k, v) => meta(k) = new String(v, "UTF-8") }
          outputKeyMeta.foreach { k =>
            if (r.key != null) meta(k) = new String(r.key, "UTF-8")
          }
          r.outputTopic.foreach(t => meta(OutputTopicMeta) = t)
          Row(new String(r.value, "UTF-8"), meta.toMap,
            if (err != null) s"redpanda_data_transform: $err" else null)
        }
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(outSchema)))
  }
}
