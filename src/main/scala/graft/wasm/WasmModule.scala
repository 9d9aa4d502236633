package graft.wasm

import scala.collection.mutable.ArrayBuffer

/** WebAssembly binary-format decoder (the public core spec,
  * https://webassembly.github.io/spec/core/binary/ — MVP plus the
  * sign-extension and non-trapping float-to-int conversion proposals,
  * which every modern toolchain emits by default).
  *
  * The reference's `wasm` processor (internal/impl/wasm/
  * processor_wazero.go:31 — contract only) embeds the wazero runtime;
  * graft runs its own interpreter, `graft.wasm`, the same make-vs-embed
  * choice as the `graft.js` and `graft.awk` engines.
  *
  * Decoding builds a STRUCTURED instruction tree per function body
  * (block/loop/if nest; branches carry relative label depths), so the
  * interpreter never re-scans bytecode for an `end` at run time.
  */
object WasmModule {

  // value types (binary encodings)
  final val I32 = 0x7f
  final val I64 = 0x7e
  final val F32 = 0x7d
  final val F64 = 0x7c
  final val V128 = 0x7b
  final val FuncRef = 0x70

  final case class FuncType(params: Vector[Int], results: Vector[Int])

  final case class Limits(min: Int, max: Option[Int])

  final case class Import(module: String, name: String, kind: Int, desc: Any)
  final case class Export(name: String, kind: Int, idx: Int)
  final case class GlobalDef(valType: Int, mutable: Boolean, init: Vector[Instr])
  final case class ElemSeg(tableIdx: Int, offset: Vector[Instr],
                           funcs: Vector[Int], passive: Boolean = false,
                           declared: Boolean = false)
  final case class DataSeg(memIdx: Int, offset: Vector[Instr],
                           bytes: Array[Byte], passive: Boolean = false)
  final case class FuncBody(locals: Vector[Int], body: Vector[Instr])

  /** One structured instruction. `op` is the opcode byte (0xFC-prefixed
    * ops are 0xFC00 | sub). Immediates land in `a`/`b` (ints) or `d`
    * (float bits via the same i64 field); nested bodies in
    * `blk`/`els`. `blockType` for block/loop/if: -1 = empty, else the
    * value type byte (single result, the MVP form).
    */
  final case class Instr(op: Int, a: Long = 0L, b: Long = 0L,
                         blockType: Int = -1,
                         blk: Vector[Instr] = Vector.empty,
                         els: Vector[Instr] = Vector.empty,
                         table: Vector[Int] = Vector.empty)

  final case class Module(types: Vector[FuncType],
                          imports: Vector[Import],
                          funcTypeIdx: Vector[Int],   // local funcs
                          tables: Vector[Limits],
                          memories: Vector[Limits],
                          globals: Vector[GlobalDef],
                          exports: Vector[Export],
                          start: Option[Int],
                          elems: Vector[ElemSeg],
                          datas: Vector[DataSeg],
                          codes: Vector[FuncBody]) {
    val importedFuncs: Vector[Import] = imports.filter(_.kind == 0)
    val importedGlobals: Vector[Import] = imports.filter(_.kind == 3)
    /** Type of function index `i` (imports first, then local funcs). */
    def typeOf(i: Int): FuncType =
      if (i < importedFuncs.length)
        types(importedFuncs(i).desc.asInstanceOf[Int])
      else types(funcTypeIdx(i - importedFuncs.length))
  }

  final class DecodeError(msg: String) extends RuntimeException(s"wasm: $msg")

  def decode(bytes: Array[Byte]): Module = new Decoder(bytes).module()

  private final class Decoder(buf: Array[Byte]) {
    private var pos = 0
    private def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    private def u32(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      v
    }
    private def s32(): Int = s64().toInt
    private def s64(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      if (shift < 64 && (b & 0x40) != 0) v |= -1L << shift
      v
    }
    private def f32bits(): Long = {
      val v = (u8() | (u8() << 8) | (u8() << 16) | (u8().toLong << 24)) & 0xffffffffL
      v
    }
    private def f64bits(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    private def name(): String = {
      val n = u32().toInt
      val s = new String(buf, pos, n, java.nio.charset.StandardCharsets.UTF_8)
      pos += n
      s
    }
    private def vec[T](f: => T): Vector[T] =
      Vector.fill(u32().toInt)(f)
    private def valType(): Int = {
      val t = u8()
      // unimplemented-proposal value types rejected BY NAME so a
      // foreign binary fails loudly at decode, not mid-execution
      if (t == 0x6a || t == 0x6b || t == 0x6c || t == 0x6d || t == 0x6e ||
          t == 0x71 || t == 0x72 || t == 0x73)
        throw new DecodeError(
          f"value type 0x$t%02x: wasm GC proposal reference types not implemented")
      if (t == 0x63 || t == 0x64)
        throw new DecodeError(
          f"value type 0x$t%02x: typed function references proposal not implemented")
      if (t != I32 && t != I64 && t != F32 && t != F64 && t != V128 &&
          t != FuncRef)
        throw new DecodeError(f"bad value type 0x$t%02x at ${pos - 1}")
      t
    }
    private def limits(): Limits = u8() match {
      case 0 => Limits(u32().toInt, None)
      case 1 => Limits(u32().toInt, Some(u32().toInt))
      case f => throw new DecodeError(s"bad limits flag $f")
    }

    def module(): Module = {
      if (buf.length < 8 || buf(0) != 0 || buf(1) != 'a' || buf(2) != 's' || buf(3) != 'm')
        throw new DecodeError("bad magic")
      pos = 4
      val version = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
      if (version != 1) throw new DecodeError(s"unsupported version $version")

      var types = Vector.empty[FuncType]
      var imports = Vector.empty[Import]
      var funcs = Vector.empty[Int]
      var tables = Vector.empty[Limits]
      var memories = Vector.empty[Limits]
      var globals = Vector.empty[GlobalDef]
      var exports = Vector.empty[Export]
      var start: Option[Int] = None
      var elems = Vector.empty[ElemSeg]
      var datas = Vector.empty[DataSeg]
      var codes = Vector.empty[FuncBody]

      while (pos < buf.length) {
        val secId = u8()
        val size = u32().toInt
        val end = pos + size
        secId match {
          case 0 => pos = end // custom section: skip
          case 1 => // types
            types = vec {
              val tag = u8()
              if (tag != 0x60) throw new DecodeError(s"bad functype tag $tag")
              FuncType(vec(valType()), vec(valType()))
            }
          case 2 => // imports
            imports = vec {
              val m = name(); val n = name()
              u8() match {
                case 0 => Import(m, n, 0, u32().toInt)               // func: typeidx
                case 1 => val t = u8(); Import(m, n, 1, (t, limits())) // table
                case 2 => Import(m, n, 2, limits())                  // memory
                case 3 => Import(m, n, 3, (valType(), u8() == 1))    // global
                case k => throw new DecodeError(s"bad import kind $k")
              }
            }
          case 3 => funcs = vec(u32().toInt)
          case 4 => // tables
            tables = vec {
              val t = u8()
              if (t != FuncRef) throw new DecodeError(s"bad elem type $t")
              limits()
            }
          case 5 => memories = vec(limits())
          case 6 => // globals
            globals = vec {
              val t = valType(); val mut = u8() == 1
              // v128 values live in a per-invocation box table (see
              // WasmInterp) — a global would outlive it
              if (t == V128)
                throw new DecodeError("v128 globals unsupported")
              GlobalDef(t, mut, exprUntilEnd())
            }
          case 7 => exports = vec(Export(name(), u8(), u32().toInt))
          case 8 => start = Some(u32().toInt)
          case 9 =>
            elems = vec {
              // bulk-memory elem flags (funcidx-vector forms 0-3; the
              // expr forms 4-7 are not emitted by the toolchains here)
              u32().toInt match {
                case 0 => ElemSeg(0, exprUntilEnd(), vec(u32().toInt))
                case 1 =>
                  val k = u8()
                  if (k != 0) throw new DecodeError(s"elemkind $k")
                  ElemSeg(0, Vector.empty, vec(u32().toInt), passive = true)
                case 2 =>
                  val t = u32().toInt
                  val off = exprUntilEnd()
                  val k = u8()
                  if (k != 0) throw new DecodeError(s"elemkind $k")
                  ElemSeg(t, off, vec(u32().toInt))
                case 3 => // declared: validation-only, no runtime content
                  val k = u8()
                  if (k != 0) throw new DecodeError(s"elemkind $k")
                  ElemSeg(0, Vector.empty, vec(u32().toInt), passive = true,
                    declared = true)
                case f => throw new DecodeError(s"elem flags $f unsupported")
              }
            }
          case 10 => // code
            codes = vec {
              val bodySize = u32().toInt
              val bodyEnd = pos + bodySize
              val locals = vec { val n = u32().toInt; val t = valType(); (n, t) }
                .flatMap { case (n, t) => Vector.fill(n)(t) }
              val body = exprUntilEnd()
              if (pos != bodyEnd)
                throw new DecodeError(s"code body drift: $pos vs $bodyEnd")
              FuncBody(locals, body)
            }
          case 11 =>
            datas = vec {
              val flags = u32().toInt
              if (flags > 2) throw new DecodeError(s"data flags $flags unsupported")
              val memIdx = if (flags == 2) u32().toInt else 0
              val off =
                if (flags == 1) Vector.empty[Instr] else exprUntilEnd()
              val n = u32().toInt
              val b = java.util.Arrays.copyOfRange(buf, pos, pos + n)
              pos += n
              DataSeg(memIdx, off, b, passive = flags == 1)
            }
          case 12 => pos = end // data count (bulk-memory): informational
          case s => throw new DecodeError(s"unknown section $s")
        }
        if (secId != 0 && secId != 12 && pos != end)
          throw new DecodeError(s"section $secId drift: $pos vs $end")
      }
      Module(types, imports, funcs, tables, memories, globals, exports,
        start, elems, datas, codes)
    }

    /** Decode a structured instruction sequence up to (consuming) the
      * closing `end` (0x0b). `else` (0x05) terminates an if-arm.
      */
    private def seq(): (Vector[Instr], Int) = {
      val out = ArrayBuffer.empty[Instr]
      while (true) {
        val op = u8()
        op match {
          case 0x0b => return (out.toVector, 0x0b)
          case 0x05 => return (out.toVector, 0x05)
          case 0x02 | 0x03 => // block | loop
            val bt = blockType()
            val (body, _) = seq()
            out += Instr(op, blockType = bt, blk = body)
          case 0x04 => // if
            val bt = blockType()
            val (thenB, term) = seq()
            val elseB = if (term == 0x05) seq()._1 else Vector.empty
            out += Instr(0x04, blockType = bt, blk = thenB, els = elseB)
          case 0x0c | 0x0d => out += Instr(op, u32())           // br, br_if
          case 0x0e => // br_table
            val targets = vec(u32().toInt)
            out += Instr(0x0e, u32(), table = targets)
          case 0x00 | 0x01 | 0x0f => out += Instr(op)           // unreachable, nop, return
          case 0x10 => out += Instr(0x10, u32())                // call
          case 0x11 => out += Instr(0x11, u32(), u32())         // call_indirect (type, table)
          case 0x1a | 0x1b => out += Instr(op)                  // drop, select
          case 0x20 | 0x21 | 0x22 | 0x23 | 0x24 =>              // local/global get/set/tee
            out += Instr(op, u32())
          case o if o >= 0x28 && o <= 0x3e =>                   // loads/stores: align, offset
            out += Instr(op, u32(), u32())
          case 0x3f | 0x40 => // memory.size / memory.grow (memidx 0)
            val m = u8()
            if (m != 0) throw new DecodeError(s"memidx $m")
            out += Instr(op)
          case 0x41 => out += Instr(0x41, s32().toLong)         // i32.const
          case 0x42 => out += Instr(0x42, s64())                // i64.const
          case 0x43 => out += Instr(0x43, f32bits())            // f32.const
          case 0x44 => out += Instr(0x44, f64bits())            // f64.const
          case o if o >= 0x45 && o <= 0xc4 => out += Instr(o)   // numeric + extend
          case 0xfc =>
            val sub = u32().toInt
            sub match {
              case s if s <= 7 => out += Instr(0xfc00 | s)      // sat-trunc
              case 8 =>                                         // memory.init
                val d = u32(); val m = u8()
                if (m != 0) throw new DecodeError("memory.init memidx")
                out += Instr(0xfc08, d)
              case 9 => out += Instr(0xfc09, u32())             // data.drop
              case 10 =>                                        // memory.copy
                if (u8() != 0 || u8() != 0)
                  throw new DecodeError("memory.copy memidx")
                out += Instr(0xfc0a)
              case 11 =>                                        // memory.fill
                if (u8() != 0) throw new DecodeError("memory.fill memidx")
                out += Instr(0xfc0b)
              case 12 =>                                        // table.init
                val e = u32(); val t = u32()
                out += Instr(0xfc0c, e, t)
              case 13 => out += Instr(0xfc0d, u32())            // elem.drop
              case 14 =>                                        // table.copy
                val d = u32(); val s = u32()
                out += Instr(0xfc0e, d, s)
              case 15 => out += Instr(0xfc0f, u32())            // table.grow
              case 16 => out += Instr(0xfc10, u32())            // table.size
              case 17 => out += Instr(0xfc11, u32())            // table.fill
              case s => throw new DecodeError(s"0xFC $s unsupported")
            }
          case 0xfd => // SIMD proposal: sub-opcode as u32 LEB
            val sub = u32().toInt
            val sop = 0xfd00 | sub
            sub match {
              case s if s <= 11 || s == 92 || s == 93 => // loads/stores: memarg
                out += Instr(sop, u32(), u32())
              case 12 | 13 => // v128.const / i8x16.shuffle: 16 bytes LE
                var lo = 0L; var hi = 0L
                var i = 0
                var maxLane = 0
                while (i < 8) {
                  val v = u8(); maxLane = math.max(maxLane, v)
                  lo |= (v & 0xffL) << (8 * i); i += 1
                }
                i = 0
                while (i < 8) {
                  val v = u8(); maxLane = math.max(maxLane, v)
                  hi |= (v & 0xffL) << (8 * i); i += 1
                }
                // shuffle selectors index the 32 lanes of a||b — a
                // validation error, not a runtime trap, per the spec
                if (sub == 13 && maxLane >= 32)
                  throw new DecodeError(s"i8x16.shuffle lane $maxLane >= 32")
                out += Instr(sop, lo, hi)
              case s if s >= 21 && s <= 34 => // extract/replace: lane idx
                val lane = u8()
                // lane count by shape: i8x16(21-23)=16, i16x8(24-26)=8,
                // i32x4(27-28)/f32x4(31-32)=4, i64x2(29-30)/f64x2(33-34)=2
                val lanes = s match {
                  case x if x <= 23 => 16
                  case x if x <= 26 => 8
                  case 27 | 28 | 31 | 32 => 4
                  case _ => 2
                }
                if (lane >= lanes)
                  throw new DecodeError(s"0xFD $s lane $lane >= $lanes")
                out += Instr(sop, lane.toLong)
              case s if s >= 84 && s <= 91 => // load/store lane: memarg+lane
                val (align, offset) = (u32(), u32())
                val lane = u8()
                val lanes = 16 >> ((s - 84) & 3) // 16/8/4/2 by width
                if (lane >= lanes)
                  throw new DecodeError(s"0xFD $s lane $lane >= $lanes")
                out += Instr(sop, align, offset, table = Vector(lane))
              case s if s > 255 =>
                throw new DecodeError(s"0xFD $s (relaxed simd) unsupported")
              case _ => out += Instr(sop) // remaining MVP ops: no immediates
            }
          // Unimplemented-proposal opcodes rejected BY NAME at decode —
          // a foreign binary using them fails loudly here with the
          // proposal spelled out, not mid-execution with a bare opcode
          // number (the discipline SIMD had before r14 implemented it)
          case 0x12 | 0x13 =>
            throw new DecodeError(f"opcode 0x$op%02x: tail-call proposal " +
              "(return_call/return_call_indirect) not implemented")
          case 0x14 =>
            throw new DecodeError("opcode 0x14: typed function references " +
              "proposal (call_ref) not implemented")
          case 0x06 | 0x07 | 0x08 | 0x09 | 0x0a | 0x18 | 0x19 =>
            throw new DecodeError(f"opcode 0x$op%02x: exception-handling " +
              "proposal not implemented")
          case 0xfe =>
            throw new DecodeError("0xFE prefix: threads proposal (atomics) " +
              "not implemented")
          case o => throw new DecodeError(f"opcode 0x$o%02x unsupported at ${pos - 1}")
        }
      }
      throw new DecodeError("unreachable")
    }

    private def blockType(): Int = {
      val t = u8()
      if (t == 0x40) -1
      else if (t == I32 || t == I64 || t == F32 || t == F64 || t == V128) t
      else throw new DecodeError(f"block type 0x$t%02x unsupported (multi-value)")
    }

    private def exprUntilEnd(): Vector[Instr] = {
      val (body, term) = seq()
      if (term != 0x0b) throw new DecodeError("expr not END-terminated")
      body
    }
  }
}
