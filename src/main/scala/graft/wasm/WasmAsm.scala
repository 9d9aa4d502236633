package graft.wasm

import scala.collection.mutable.ArrayBuffer

/** WebAssembly binary-format ASSEMBLER: builds real `.wasm` module
  * bytes section by section (the inverse of [[WasmModule.decode]]).
  *
  * This exists because the container has no wasm toolchain — gates and
  * specs hand-assemble the guest modules they run, the same way the
  * protocol specs hand-assemble wire frames. Emitted modules are
  * spec-conformant binaries: any engine (wazero, wasmtime, a browser)
  * would load them.
  */
object WasmAsm {
  import WasmModule.{I32, I64, F32, F64}

  private def leb(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
  }
  private def sleb(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    var more = true
    while (more) {
      val b = (v & 0x7f).toInt
      v >>= 7
      if ((v == 0 && (b & 0x40) == 0) || (v == -1 && (b & 0x40) != 0)) {
        out += b.toByte; more = false
      } else out += (b | 0x80).toByte
    }
  }

  /** Instruction emitter for one function body / const expr. */
  final class Code {
    private[WasmAsm] val out = ArrayBuffer.empty[Byte]
    private def u8(v: Int): Code = { out += v.toByte; this }
    private def u(v: Long): Code = { leb(out, v); this }
    private def s(v: Long): Code = { sleb(out, v); this }
    private def bt(t: Int): Code = u8(if (t < 0) 0x40 else t)

    def unreachable(): Code = u8(0x00)
    def nop(): Code = u8(0x01)
    def block(resultType: Int = -1)(body: => Unit): Code = {
      u8(0x02); bt(resultType); body; u8(0x0b) }
    def loop(resultType: Int = -1)(body: => Unit): Code = {
      u8(0x03); bt(resultType); body; u8(0x0b) }
    def ifThen(resultType: Int = -1)(thenB: => Unit): Code = {
      u8(0x04); bt(resultType); thenB; u8(0x0b) }
    def ifThenElse(resultType: Int = -1)(thenB: => Unit)(elseB: => Unit): Code = {
      u8(0x04); bt(resultType); thenB; u8(0x05); elseB; u8(0x0b) }
    def br(depth: Int): Code = { u8(0x0c); u(depth) }
    def brIf(depth: Int): Code = { u8(0x0d); u(depth) }
    def brTable(targets: Seq[Int], default: Int): Code = {
      u8(0x0e); u(targets.length)
      targets.foreach(t => u(t)); u(default); this
    }
    def ret(): Code = u8(0x0f)
    def call(funcIdx: Int): Code = { u8(0x10); u(funcIdx) }
    def callIndirect(typeIdx: Int): Code = { u8(0x11); u(typeIdx); u8(0x00) }
    def drop(): Code = u8(0x1a)
    def select(): Code = u8(0x1b)
    def localGet(i: Int): Code = { u8(0x20); u(i) }
    def localSet(i: Int): Code = { u8(0x21); u(i) }
    def localTee(i: Int): Code = { u8(0x22); u(i) }
    def globalGet(i: Int): Code = { u8(0x23); u(i) }
    def globalSet(i: Int): Code = { u8(0x24); u(i) }
    private def memop(op: Int, align: Int, offset: Int): Code = {
      u8(op); u(align); u(offset) }
    def i32Load(offset: Int = 0, align: Int = 2): Code = memop(0x28, align, offset)
    def i64Load(offset: Int = 0, align: Int = 3): Code = memop(0x29, align, offset)
    def f64Load(offset: Int = 0, align: Int = 3): Code = memop(0x2b, align, offset)
    def i32Load8U(offset: Int = 0): Code = memop(0x2d, 0, offset)
    def i32Load8S(offset: Int = 0): Code = memop(0x2c, 0, offset)
    def i32Store(offset: Int = 0, align: Int = 2): Code = memop(0x36, align, offset)
    def i64Store(offset: Int = 0, align: Int = 3): Code = memop(0x37, align, offset)
    def f64Store(offset: Int = 0, align: Int = 3): Code = memop(0x39, align, offset)
    def i32Store8(offset: Int = 0): Code = memop(0x3a, 0, offset)
    def memorySize(): Code = { u8(0x3f); u8(0x00) }
    def memoryGrow(): Code = { u8(0x40); u8(0x00) }
    // bulk memory (0xFC-prefixed)
    def memoryInit(dataIdx: Int): Code = { u8(0xfc); u(8); u(dataIdx); u8(0x00) }
    def dataDrop(dataIdx: Int): Code = { u8(0xfc); u(9); u(dataIdx) }
    def memoryCopy(): Code = { u8(0xfc); u(10); u8(0x00); u8(0x00) }
    def memoryFill(): Code = { u8(0xfc); u(11); u8(0x00) }
    def i32Const(v: Int): Code = { u8(0x41); s(v.toLong) }
    def i64Const(v: Long): Code = { u8(0x42); s(v) }
    def f32Const(v: Float): Code = {
      u8(0x43)
      val bits = java.lang.Float.floatToRawIntBits(v)
      (0 until 4).foreach(i => out += (bits >> (8 * i)).toByte)
      this
    }
    def f64Const(v: Double): Code = {
      u8(0x44)
      val bits = java.lang.Double.doubleToRawLongBits(v)
      (0 until 8).foreach(i => out += (bits >> (8 * i)).toByte)
      this
    }
    /** Any plain (no-immediate) opcode by byte: i32.add = 0x6a, … */
    def op(opcode: Int): Code = u8(opcode)
    def i32Add(): Code = op(0x6a)
    def i32Sub(): Code = op(0x6b)
    def i32Mul(): Code = op(0x6c)
    def i32DivU(): Code = op(0x6e)
    def i32RemU(): Code = op(0x70)
    def i32And(): Code = op(0x71)
    def i32Or(): Code = op(0x72)
    def i32Xor(): Code = op(0x73)
    def i32Shl(): Code = op(0x74)
    def i32ShrU(): Code = op(0x76)
    def i32Eqz(): Code = op(0x45)
    def i32Eq(): Code = op(0x46)
    def i32Ne(): Code = op(0x47)
    def i32LtS(): Code = op(0x48)
    def i32LtU(): Code = op(0x49)
    def i32GtS(): Code = op(0x4a)
    def i32GeS(): Code = op(0x4e)
    def i32GeU(): Code = op(0x4f)
    def i32LeS(): Code = op(0x4c)
    def i64Add(): Code = op(0x7c)
    def i64Mul(): Code = op(0x7e)
    def i64Shl(): Code = op(0x86)
    def i64ShrU(): Code = op(0x88)
    def i64Or(): Code = op(0x84)
    def i64And(): Code = op(0x83)
    def i32WrapI64(): Code = op(0xa7)
    def i64ExtendI32U(): Code = op(0xad)
    def i64ExtendI32S(): Code = op(0xac)

    // ── SIMD (0xFD prefix) ───────────────────────────────────────────
    /** Any no-immediate SIMD op by sub-opcode: i8x16.add = 110, … */
    def simd(sub: Int): Code = { u8(0xfd); u(sub.toLong); this }
    /** Lane-immediate SIMD op (extract/replace): sub, lane byte. */
    def simdLane(sub: Int, lane: Int): Code = {
      u8(0xfd); u(sub.toLong); u8(lane)
    }
    def v128Const(bytes: Array[Byte]): Code = {
      require(bytes.length == 16, "v128.const needs 16 bytes")
      u8(0xfd); u(12L); bytes.foreach(out += _); this
    }
    def i8x16Shuffle(lanes: Array[Byte]): Code = {
      require(lanes.length == 16, "shuffle needs 16 lane indices")
      u8(0xfd); u(13L); lanes.foreach(out += _); this
    }
    def v128Load(offset: Int = 0, align: Int = 4): Code = {
      u8(0xfd); u(0L); u(align.toLong); u(offset.toLong); this
    }
    /** The load-shape family (extend 1–6, splat 7–10, zero 92/93):
      * sub-opcode + memarg. */
    def v128LoadShape(sub: Int, offset: Int = 0, align: Int = 0): Code = {
      u8(0xfd); u(sub.toLong); u(align.toLong); u(offset.toLong); this
    }
    /** load/store lane (84–91): sub-opcode + memarg + lane index. */
    def simdLaneMem(sub: Int, lane: Int, offset: Int = 0,
                    align: Int = 0): Code = {
      u8(0xfd); u(sub.toLong); u(align.toLong); u(offset.toLong); u8(lane)
    }
    def v128Store(offset: Int = 0, align: Int = 4): Code = {
      u8(0xfd); u(11L); u(align.toLong); u(offset.toLong); this
    }
  }

  final case class FuncDef(typeIdx: Int, locals: Seq[Int], code: Code)

  /** Module builder: declare types/imports first (imports take the low
    * function indices), then functions; `build()` emits the binary.
    */
  final class ModuleBuilder {
    private val types = ArrayBuffer.empty[(Seq[Int], Seq[Int])]
    private val imports = ArrayBuffer.empty[(String, String, Int)] // fn imports
    private val funcs = ArrayBuffer.empty[FuncDef]
    private val exports = ArrayBuffer.empty[(String, Int, Int)]
    private var memLimits: Option[(Int, Option[Int])] = None
    private var exportMemName: Option[String] = None
    private val globals = ArrayBuffer.empty[(Int, Boolean, Code)]
    private val datas = ArrayBuffer.empty[(Option[Int], Array[Byte])]
    private var tableMin = -1
    private val elems = ArrayBuffer.empty[(Int, Seq[Int])]
    private var startFn = -1

    def funcType(params: Seq[Int], results: Seq[Int]): Int = {
      val key = (params, results)
      val i = types.indexOf(key)
      if (i >= 0) i else { types += key; types.length - 1 }
    }

    /** Returns the imported function's index (imports come first). */
    def importFunc(module: String, name: String, typeIdx: Int): Int = {
      require(funcs.isEmpty, "declare imports before functions")
      imports += ((module, name, typeIdx))
      imports.length - 1
    }

    /** Returns the function's index. */
    def func(typeIdx: Int, locals: Seq[Int] = Nil)(body: Code => Unit): Int = {
      val c = new Code
      body(c)
      funcs += FuncDef(typeIdx, locals, c)
      imports.length + funcs.length - 1
    }

    def exportFunc(name: String, funcIdx: Int): Unit =
      exports += ((name, 0, funcIdx))
    def memory(min: Int, max: Option[Int] = None,
               exportAs: Option[String] = Some("memory")): Unit = {
      memLimits = Some((min, max)); exportMemName = exportAs
    }
    def global(valType: Int, mutable: Boolean)(init: Code => Unit): Int = {
      val c = new Code; init(c); globals += ((valType, mutable, c))
      globals.length - 1
    }
    def data(offset: Int, bytes: Array[Byte]): Unit =
      datas += ((Some(offset), bytes))
    /** Passive data segment (bulk memory) — returns its index for
      * memory.init / data.drop. */
    def dataPassive(bytes: Array[Byte]): Int = {
      datas += ((None, bytes)); datas.length - 1
    }
    def table(min: Int): Unit = tableMin = min
    def elem(offset: Int, funcIdxs: Seq[Int]): Unit = elems += ((offset, funcIdxs))
    def start(funcIdx: Int): Unit = startFn = funcIdx

    def build(): Array[Byte] = {
      val out = ArrayBuffer.empty[Byte]
      out ++= Array[Byte](0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00)

      def section(id: Int)(body: ArrayBuffer[Byte] => Unit): Unit = {
        val b = ArrayBuffer.empty[Byte]
        body(b)
        out += id.toByte
        leb(out, b.length.toLong)
        out ++= b
      }
      def vec(b: ArrayBuffer[Byte], n: Int)(each: Int => Unit): Unit = {
        leb(b, n.toLong); (0 until n).foreach(each)
      }
      def str(b: ArrayBuffer[Byte], s: String): Unit = {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        leb(b, bytes.length.toLong); b ++= bytes
      }
      def limits(b: ArrayBuffer[Byte], min: Int, max: Option[Int]): Unit =
        max match {
          case None => b += 0x00; leb(b, min.toLong)
          case Some(m) => b += 0x01; leb(b, min.toLong); leb(b, m.toLong)
        }

      if (types.nonEmpty) section(1) { b =>
        vec(b, types.length) { i =>
          val (p, r) = types(i)
          b += 0x60.toByte
          leb(b, p.length.toLong); p.foreach(t => b += t.toByte)
          leb(b, r.length.toLong); r.foreach(t => b += t.toByte)
        }
      }
      if (imports.nonEmpty) section(2) { b =>
        vec(b, imports.length) { i =>
          val (m, n, t) = imports(i)
          str(b, m); str(b, n); b += 0x00; leb(b, t.toLong)
        }
      }
      if (funcs.nonEmpty) section(3) { b =>
        vec(b, funcs.length)(i => leb(b, funcs(i).typeIdx.toLong))
      }
      if (tableMin >= 0) section(4) { b =>
        vec(b, 1) { _ => b += 0x70; limits(b, tableMin, None) }
      }
      memLimits.foreach { case (min, max) =>
        section(5)(b => vec(b, 1)(_ => limits(b, min, max)))
      }
      if (globals.nonEmpty) section(6) { b =>
        vec(b, globals.length) { i =>
          val (t, mut, init) = globals(i)
          b += t.toByte
          b += (if (mut) 1 else 0).toByte
          b ++= init.out
          b += 0x0b.toByte
        }
      }
      val allExports = exports.toSeq ++
        (if (memLimits.isDefined) exportMemName.map(n => (n, 2, 0)).toSeq else Nil)
      if (allExports.nonEmpty) section(7) { b =>
        vec(b, allExports.length) { i =>
          val (n, kind, idx) = allExports(i)
          str(b, n); b += kind.toByte; leb(b, idx.toLong)
        }
      }
      if (startFn >= 0) section(8)(b => leb(b, startFn.toLong))
      if (elems.nonEmpty) section(9) { b =>
        vec(b, elems.length) { i =>
          val (off, fns) = elems(i)
          leb(b, 0L)
          b += 0x41.toByte; sleb(b, off.toLong); b += 0x0b.toByte
          leb(b, fns.length.toLong); fns.foreach(f => leb(b, f.toLong))
        }
      }
      // DataCount (id 12) must PRECEDE code when memory.init/data.drop
      // are used — emitted whenever a passive segment exists
      if (datas.exists(_._1.isEmpty))
        section(12)(b => leb(b, datas.length.toLong))
      if (funcs.nonEmpty) section(10) { b =>
        vec(b, funcs.length) { i =>
          val f = funcs(i)
          val body = ArrayBuffer.empty[Byte]
          // locals: run-length by type (one run per local keeps it simple)
          val runs = f.locals.foldLeft(Vector.empty[(Int, Int)]) { (acc, t) =>
            acc.lastOption match {
              case Some((lt, n)) if lt == t => acc.init :+ (lt, n + 1)
              case _ => acc :+ (t, 1)
            }
          }
          leb(body, runs.length.toLong)
          runs.foreach { case (t, n) => leb(body, n.toLong); body += t.toByte }
          body ++= f.code.out
          body += 0x0b.toByte
          leb(b, body.length.toLong)
          b ++= body
        }
      }
      if (datas.nonEmpty) section(11) { b =>
        vec(b, datas.length) { i =>
          val (off, bytes) = datas(i)
          off match {
            case Some(o) =>
              leb(b, 0L)
              b += 0x41.toByte; sleb(b, o.toLong); b += 0x0b.toByte
            case None =>
              leb(b, 1L) // passive
          }
          leb(b, bytes.length.toLong); b ++= bytes
        }
      }
      out.toArray
    }
  }
}
