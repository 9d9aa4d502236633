package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

import graft.sources.Envelope
import graft.wasm.{WasmInterp, WasmModule}
import graft.wasm.WasmInterp.{HostFn, Instance, Trap}

/** The `wasm` processor (reference internal/impl/wasm/
  * processor_wazero.go:31, functions.go:36-123 — contract only: the
  * reference embeds the wazero runtime; this runs graft's own
  * interpreter, `graft.wasm`).
  *
  * Per-message execution of a function exported by a WASM module, with
  * the reference's `benthos_wasm` host API from inside the module:
  *
  *  - `v0_msg_as_bytes() -> i64` — message content; the host allocates
  *    guest memory via the module's own exported allocator (`malloc`
  *    for Go-style modules, `allocate` for Rust-style) and returns
  *    `(ptr << 32) | len`
  *  - `v0_msg_set_bytes(ptr, len)` — replace message content
  *  - `v0_msg_get_meta(keyPtr, keyLen) -> i64` — metadata value
  *    (missing key = empty string, the reference's behavior)
  *  - `v0_msg_set_meta(keyPtr, keyLen, valPtr, valLen)`
  *
  * Inbound allocations are freed (via `free`) after the process call
  * returns, and outbound reads are released via `deallocate` when the
  * module exports it — the reference's go/rust allocator discipline.
  *
  * Runtime contract: one module instance is NOT safe across threads
  * (processor_wazero.go:45 pools instances); here each PARTITION gets
  * its own instance, reused across that partition's messages, so
  * module-global state persists within a partition exactly like the
  * reference's pooled runners.
  *
  * Scale shape: the module binary decodes ONCE on the driver (fail
  * fast), rides the closure as bytes, and instantiates per partition;
  * execution is `mapPartitions` — no shuffle, no driver involvement.
  * A wasm trap or host-API misuse lands on the message's error channel
  * instead of failing the task.
  */
object Wasm {

  /** One instantiated module bound to mutable per-message state. */
  final class Runner(moduleBytes: Array[Byte], functionName: String) {
    var value: Array[Byte] = Array.emptyByteArray
    val meta: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty
    var procErr: String = null
    private val afterProcessing = mutable.ArrayBuffer.empty[() => Unit]

    private def funcErr(msg: String): Unit =
      if (procErr == null) procErr = msg

    private val instance: Instance = {
      val mod = WasmModule.decode(moduleBytes)
      new Instance(mod, hostFns = hostApi)
    }

    private lazy val processFn =
      instance.exportedFunction(functionName).getOrElse(
        throw new WasmInterp.LinkError(s"module exports no '$functionName'"))
    // go-style (malloc/free) or rust-style (allocate/deallocate)
    private lazy val allocFn =
      instance.exportedFunction("malloc")
        .orElse(instance.exportedFunction("allocate"))
    private lazy val freeFn = instance.exportedFunction("free")
    private lazy val deallocFn = instance.exportedFunction("deallocate")

    private def allocateInbound(data: Array[Byte]): Long = {
      val alloc = allocFn.getOrElse(
        throw new Trap("module exports neither malloc nor allocate"))
      val ptr = alloc(Array(data.length.toLong))(0)
      freeFn.foreach { free =>
        afterProcessing += (() => { free(Array(ptr)); () })
      }
      instance.writeBytes(ptr.toInt, data)
      ptr
    }

    private def readOutbound(ptr: Int, size: Int): Array[Byte] = {
      val bytes = instance.readBytes(ptr, size)
      deallocFn.foreach(d => d(Array(ptr.toLong, size.toLong)))
      bytes
    }

    private def ptrLen(ptr: Long, len: Int): Array[Long] =
      Array((ptr << 32) | (len.toLong & 0xffffffffL))

    private def hostApi: Map[(String, String), HostFn] = Map(
      ("benthos_wasm", "v0_msg_as_bytes") -> { _ =>
        val ptr = allocateInbound(value)
        ptrLen(ptr, value.length)
      },
      ("benthos_wasm", "v0_msg_set_bytes") -> { args =>
        value = readOutbound(args(0).toInt, args(1).toInt)
        Array.empty
      },
      ("benthos_wasm", "v0_msg_get_meta") -> { args =>
        val key = new String(readOutbound(args(0).toInt, args(1).toInt), "UTF-8")
        val v = meta.getOrElse(key, "").getBytes("UTF-8")
        val ptr = allocateInbound(v)
        ptrLen(ptr, v.length)
      },
      ("benthos_wasm", "v0_msg_set_meta") -> { args =>
        val key = new String(readOutbound(args(0).toInt, args(1).toInt), "UTF-8")
        val v = new String(readOutbound(args(2).toInt, args(3).toInt), "UTF-8")
        meta(key) = v
        Array.empty
      })

    /** Force export resolution (driver-side fail-fast). */
    def validate(): Unit = { processFn; () }

    /** Run the exported function against one message. */
    def process(valueIn: Array[Byte],
                metaIn: Iterable[(String, String)]): Unit = {
      value = valueIn
      meta.clear()
      metaIn.foreach { case (k, v) => meta(k) = v }
      procErr = null
      afterProcessing.clear()
      try processFn(Array.empty)
      catch {
        case t: Trap => funcErr(t.getMessage)
        case e: WasmInterp.LinkError => funcErr(e.getMessage)
      } finally {
        afterProcessing.foreach { f =>
          try f() catch { case t: Trap => funcErr(t.getMessage) }
        }
      }
    }
  }

  /** The processor: runs `function` from the module for each message.
    * `moduleBytes` is the raw `.wasm` binary (from `module_path` in the
    * declarative form).
    */
  def processor(df0: DataFrame, moduleBytes: Array[Byte],
                function: String = "process"): DataFrame = {
    // driver-side: decode + instantiate once so a bad module fails the
    // plan, not the tasks (reference ensures one runner at config time)
    new Runner(moduleBytes, function).validate()

    val df = Envelope.ensure(df0)
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val mIdx = schema.fieldIndex(Envelope.MetadataCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val bytes = moduleBytes
    val fn = function

    df.mapPartitions { rows =>
      val runner = new Runner(bytes, fn)
      rows.map { row =>
        val in = row.getString(vIdx)
        val metaIn = Option(row.getMap[String, String](mIdx))
          .map(_.toSeq).getOrElse(Seq.empty)
        runner.process(
          if (in == null) Array.emptyByteArray else in.getBytes("UTF-8"),
          metaIn)
        val vals = row.toSeq.toArray
        vals(vIdx) = new String(runner.value, "UTF-8")
        vals(mIdx) = runner.meta.toMap
        if (runner.procErr != null) vals(eIdx) = s"wasm: ${runner.procErr}"
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
  }
}
