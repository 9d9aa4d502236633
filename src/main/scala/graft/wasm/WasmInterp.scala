package graft.wasm

import WasmModule._

/** WebAssembly interpreter over the structured instruction tree
  * ([[WasmModule.decode]]): a classic operand-stack evaluator with
  * branch unwinding by return code (no exceptions on the branch path).
  *
  * Value representation: one `Long` per wasm value — i32 sign-extended,
  * i64 as-is, f32 as 32-bit float bits, f64 as 64-bit double bits. The
  * operand stack is a growable `Array[Long]`; call frames get a plain
  * `Array[Long]` of locals. v128 values (SIMD proposal) keep the
  * one-slot invariant by living in a per-invocation side table of
  * immutable 16-byte little-endian arrays — the slot holds the box
  * index, so block arities, `select`, `drop` and local slots stay
  * type-oblivious; the table drains when the outermost call returns. Traps (unreachable, division by zero,
  * out-of-bounds access, invalid conversion, bad indirect call) throw
  * [[WasmInterp.Trap]], which the embedding processor maps to the
  * message error channel.
  *
  * Execution model mirrors wazero's per-instance single-thread contract
  * (reference internal/impl/wasm/processor_wazero.go:45 — contract
  * only): an [[Instance]] is NOT thread-safe; embedders pool one per
  * partition.
  */
object WasmInterp {

  final class Trap(msg: String) extends RuntimeException(s"wasm trap: $msg")
  final class LinkError(msg: String) extends RuntimeException(s"wasm link: $msg")

  /** Host function: receives arg values, returns result values. */
  type HostFn = Array[Long] => Array[Long]

  private final val PageSize = 65536
  private final val NORMAL = -1
  private final val RETURN = Int.MaxValue
  private final val MaxCallDepth = 2048

  final class Instance(val module: Module,
                       hostFns: Map[(String, String), HostFn] = Map.empty,
                       maxMemoryPages: Int = 1024) {

    // ── imports: functions only (the processor's host API surface) ────
    module.imports.foreach { imp =>
      imp.kind match {
        case 0 =>
          if (!hostFns.contains((imp.module, imp.name)))
            throw new LinkError(s"unresolved import ${imp.module}.${imp.name}")
        case k => throw new LinkError(
          s"import kind $k (${imp.module}.${imp.name}) unsupported — " +
            "define memory/table/globals in the module")
      }
    }
    private val importedFns: Array[HostFn] =
      module.importedFuncs.map(i => hostFns((i.module, i.name))).toArray
    private val nImported = importedFns.length

    // ── memory ────────────────────────────────────────────────────────
    private var memPages: Int =
      module.memories.headOption.map(_.min).getOrElse(0)
    private val memMax: Int =
      module.memories.headOption.flatMap(_.max)
        .map(m => math.min(m, maxMemoryPages)).getOrElse(maxMemoryPages)
    private var mem: Array[Byte] = new Array[Byte](memPages * PageSize)

    // ── globals ───────────────────────────────────────────────────────
    private val globals: Array[Long] =
      module.globals.map(g => evalConst(g.init)).toArray

    // ── table (growable — bulk-memory table.grow) ─────────────────────
    private var table: Array[Int] =
      Array.fill(module.tables.headOption.map(_.min).getOrElse(0))(-1)
    private val tableMax: Int = module.tables.headOption
      .flatMap(_.max).getOrElse(1 << 20)
    module.elems.withFilter(!_.passive).foreach { e =>
      val off = evalConst(e.offset).toInt
      if (off < 0 || off + e.funcs.length > table.length)
        throw new Trap("element segment out of bounds")
      e.funcs.indices.foreach(i => table(off + i) = e.funcs(i))
    }
    // passive elem segments stay addressable by table.init until dropped;
    // the spec drops ACTIVE segments after instantiation and DECLARED
    // (flags-3) segments immediately, so table.init on them traps for n>0
    private val droppedElems = new Array[Boolean](module.elems.length)
    module.elems.indices.foreach { i =>
      if (!module.elems(i).passive || module.elems(i).declared)
        droppedElems(i) = true
    }

    // ── data segments ─────────────────────────────────────────────────
    module.datas.withFilter(!_.passive).foreach { d =>
      val off = evalConst(d.offset).toInt
      if (off < 0 || off.toLong + d.bytes.length > mem.length)
        throw new Trap("data segment out of bounds")
      System.arraycopy(d.bytes, 0, mem, off, d.bytes.length)
    }
    // passive data segments stay addressable by memory.init until dropped;
    // active segments are dropped after instantiation per the spec, so
    // memory.init on them traps for n>0 rather than re-copying their bytes
    private val droppedData = new Array[Boolean](module.datas.length)
    module.datas.indices.foreach { i =>
      if (!module.datas(i).passive) droppedData(i) = true
    }

    private val exportsByName: Map[String, Export] =
      module.exports.map(e => e.name -> e).toMap

    // ── v128 boxes (SIMD): immutable 16-byte LE arrays, slot = index ──
    // The table drains when the outermost call returns; WITHIN one
    // invocation every v128-producing instruction appends (slots are
    // untyped longs, so safe in-place compaction would need refcounts
    // at every slot copy). A hard cap turns a pathological
    // SIMD-op-per-byte guest into a loud trap (~350 MB retained at the
    // cap) instead of a silent executor OOM; ordinary guests — llhttp's
    // SIMD build, transform batches — use a few boxes per message.
    private val V128TableMax = 8 * 1024 * 1024
    private val v128s = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    private def boxV128(bytes: Array[Byte]): Long = {
      if (v128s.length >= V128TableMax)
        throw new Trap(s"v128 value table exceeded $V128TableMax entries " +
          "in one invocation (see WasmInterp's boxed-v128 design note)")
      v128s += bytes; (v128s.length - 1).toLong
    }
    private def popV(): Array[Byte] = v128s(pop().toInt)
    private def pushV(bytes: Array[Byte]): Unit = push(boxV128(bytes))

    // ── operand stack ─────────────────────────────────────────────────
    private var stack = new Array[Long](256)
    private var sp = 0
    private def push(v: Long): Unit = {
      if (sp == stack.length)
        stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      stack(sp) = v; sp += 1
    }
    private def pop(): Long = { sp -= 1; stack(sp) }
    private var depth = 0

    private def evalConst(expr: Vector[Instr]): Long = {
      // constant expressions: one const or global.get (imported consts
      // are out of scope — no imported globals are linked)
      expr match {
        case Vector(i) if i.op == 0x41 || i.op == 0x42 || i.op == 0x43 || i.op == 0x44 =>
          i.a
        case other => throw new LinkError(s"unsupported const expr $other")
      }
    }

    module.start.foreach(invokeByIndex(_, Array.empty))

    // ── public surface ────────────────────────────────────────────────

    def exportedFunction(fnName: String): Option[Array[Long] => Array[Long]] =
      exportsByName.get(fnName).filter(_.kind == 0).map { e => args =>
        invokeByIndex(e.idx, args)
      }

    def invoke(fnName: String, args: Long*): Array[Long] = {
      // v128 boxes live in a per-invocation side table cleared when the
      // outermost invoke returns — a v128 param/result at the HOST
      // boundary would exchange dangling box-table indices as
      // meaningless longs, so reject such signatures loudly (ADVICE
      // r14). Internal calls pass v128 freely; only the host seam is
      // scalar-typed.
      val fnIdx = module.exports.collectFirst {
        case e if e.name == fnName && e.kind == 0 => e.idx
      }
      fnIdx.foreach { idx =>
        val ft = module.typeOf(idx)
        if (ft.params.contains(WasmModule.V128) ||
            ft.results.contains(WasmModule.V128))
          throw new LinkError(s"exported function $fnName takes/returns " +
            "v128 — not representable at the host Long boundary; wrap it " +
            "in a wasm-side shim that passes vectors through linear memory")
      }
      exportedFunction(fnName)
        .getOrElse(throw new LinkError(s"no exported function $fnName"))
        .apply(args.toArray)
    }

    def memorySizeBytes: Int = mem.length

    def readBytes(addr: Int, n: Int): Array[Byte] = {
      if (addr < 0 || n < 0 || addr.toLong + n > mem.length)
        throw new Trap(s"host read out of bounds: $addr+$n")
      java.util.Arrays.copyOfRange(mem, addr, addr + n)
    }

    def writeBytes(addr: Int, bytes: Array[Byte]): Unit = {
      if (addr < 0 || addr.toLong + bytes.length > mem.length)
        throw new Trap(s"host write out of bounds: $addr+${bytes.length}")
      System.arraycopy(bytes, 0, mem, addr, bytes.length)
    }

    // ── function invocation ───────────────────────────────────────────

    private def invokeByIndex(idx: Int, args: Array[Long]): Array[Long] = {
      val ft = module.typeOf(idx)
      require(args.length == ft.params.length,
        s"arity: ${args.length} args for ${ft.params.length} params")
      if (idx < nImported) return importedFns(idx)(args)
      if (depth >= MaxCallDepth) throw new Trap("call stack exhausted")
      depth += 1
      try {
        val body = module.codes(idx - nImported)
        val locals = new Array[Long](args.length + body.locals.length)
        System.arraycopy(args, 0, locals, 0, args.length)
        // v128 locals default to the zero vector — slot 0 of the box
        // table would otherwise alias whatever box was allocated first
        var li = 0
        while (li < body.locals.length) {
          if (body.locals(li) == WasmModule.V128)
            locals(args.length + li) = boxV128(new Array[Byte](16))
          li += 1
        }
        val base = sp
        val r = run(body.body, locals)
        val nRes = ft.results.length
        val out = new Array[Long](nRes)
        var i = nRes - 1
        while (i >= 0) { out(i) = pop(); i -= 1 }
        sp = base
        val _ = r
        out
      } finally {
        depth -= 1
        // v128 boxes are per-top-level-invocation: values can flow
        // across nested frames, so the table drains only when the
        // outermost call returns (bounds growth without lifetime juggling)
        if (depth == 0 && v128s.nonEmpty) v128s.clear()
      }
    }

    /** Run a sequence; returns NORMAL, RETURN, or a branch depth
      * TARGETING AN ENCLOSING label (0 = innermost enclosing).
      */
    private def run(instrs: Vector[Instr], locals: Array[Long]): Int = {
      var i = 0
      val n = instrs.length
      while (i < n) {
        val ins = instrs(i)
        val r = exec(ins, locals)
        if (r != NORMAL) return r
        i += 1
      }
      NORMAL
    }

    private def labelArity(blockType: Int): Int = if (blockType == -1) 0 else 1

    /** Unwind the stack for a branch that lands on a label: keep the
      * label's arity values from the top, reset to the entry height.
      */
    private def unwindTo(entry: Int, arity: Int): Unit = {
      if (sp != entry + arity) {
        var i = 0
        while (i < arity) {
          stack(entry + i) = stack(sp - arity + i); i += 1
        }
        sp = entry + arity
      }
    }

    private def exec(ins: Instr, locals: Array[Long]): Int = (ins.op: @annotation.switch) match {
      // ── control ──────────────────────────────────────────────────────
      case 0x00 => throw new Trap("unreachable")
      case 0x01 => NORMAL // nop
      case 0x02 => // block
        val entry = sp
        val r = run(ins.blk, locals)
        if (r == NORMAL) NORMAL
        else if (r == RETURN) RETURN
        else if (r == 0) { unwindTo(entry, labelArity(ins.blockType)); NORMAL }
        else r - 1
      case 0x03 => // loop
        val entry = sp
        while (true) {
          val r = run(ins.blk, locals)
          if (r == NORMAL) return NORMAL
          if (r == RETURN) return RETURN
          if (r > 0) return r - 1
          sp = entry // br 0 on a loop: restart with the entry stack
        }
        NORMAL
      case 0x04 => // if
        val cond = pop().toInt
        val entry = sp
        val body = if (cond != 0) ins.blk else ins.els
        val r = run(body, locals)
        if (r == NORMAL) NORMAL
        else if (r == RETURN) RETURN
        else if (r == 0) { unwindTo(entry, labelArity(ins.blockType)); NORMAL }
        else r - 1
      case 0x0c => ins.a.toInt // br
      case 0x0d => if (pop().toInt != 0) ins.a.toInt else NORMAL // br_if
      case 0x0e => // br_table
        val idx = pop().toInt
        if (idx >= 0 && idx < ins.table.length) ins.table(idx) else ins.a.toInt
      case 0x0f => RETURN
      case 0x10 => // call
        val res = invokeByIndexPoppingArgs(ins.a.toInt)
        res.foreach(push)
        NORMAL
      case 0x11 => // call_indirect
        val elem = pop().toInt
        if (elem < 0 || elem >= table.length || table(elem) < 0)
          throw new Trap(s"undefined table element $elem")
        val fIdx = table(elem)
        val expected = module.types(ins.a.toInt)
        if (module.typeOf(fIdx) != expected)
          throw new Trap("indirect call type mismatch")
        val res = invokeByIndexPoppingArgs(fIdx)
        res.foreach(push)
        NORMAL

      // ── parametric ───────────────────────────────────────────────────
      case 0x1a => pop(); NORMAL // drop
      case 0x1b => // select
        val c = pop().toInt; val b = pop(); val a = pop()
        push(if (c != 0) a else b); NORMAL

      // ── locals / globals ─────────────────────────────────────────────
      case 0x20 => push(locals(ins.a.toInt)); NORMAL
      case 0x21 => locals(ins.a.toInt) = pop(); NORMAL
      case 0x22 => locals(ins.a.toInt) = stack(sp - 1); NORMAL // tee
      case 0x23 => push(globals(ins.a.toInt)); NORMAL
      case 0x24 => globals(ins.a.toInt) = pop(); NORMAL

      // ── memory ───────────────────────────────────────────────────────
      case 0x28 => push(ld(4, ins.b).toInt.toLong); NORMAL       // i32.load
      case 0x29 => push(ld(8, ins.b)); NORMAL                    // i64.load
      case 0x2a => push(ld(4, ins.b) & 0xffffffffL); NORMAL      // f32.load (bits)
      case 0x2b => push(ld(8, ins.b)); NORMAL                    // f64.load
      case 0x2c => push(ld(1, ins.b).toByte.toLong); NORMAL      // i32.load8_s
      case 0x2d => push(ld(1, ins.b) & 0xffL); NORMAL            // i32.load8_u
      case 0x2e => push(ld(2, ins.b).toShort.toLong); NORMAL     // i32.load16_s
      case 0x2f => push(ld(2, ins.b) & 0xffffL); NORMAL          // i32.load16_u
      case 0x30 => push(ld(1, ins.b).toByte.toLong); NORMAL      // i64.load8_s
      case 0x31 => push(ld(1, ins.b) & 0xffL); NORMAL
      case 0x32 => push(ld(2, ins.b).toShort.toLong); NORMAL
      case 0x33 => push(ld(2, ins.b) & 0xffffL); NORMAL
      case 0x34 => push(ld(4, ins.b).toInt.toLong); NORMAL       // i64.load32_s
      case 0x35 => push(ld(4, ins.b) & 0xffffffffL); NORMAL
      case 0x36 => { val v = pop(); st(4, ins.b, v) }; NORMAL    // i32.store
      case 0x37 => { val v = pop(); st(8, ins.b, v) }; NORMAL    // i64.store
      case 0x38 => { val v = pop(); st(4, ins.b, v) }; NORMAL    // f32.store
      case 0x39 => { val v = pop(); st(8, ins.b, v) }; NORMAL    // f64.store
      case 0x3a => { val v = pop(); st(1, ins.b, v) }; NORMAL
      case 0x3b => { val v = pop(); st(2, ins.b, v) }; NORMAL
      case 0x3c => { val v = pop(); st(1, ins.b, v) }; NORMAL
      case 0x3d => { val v = pop(); st(2, ins.b, v) }; NORMAL
      case 0x3e => { val v = pop(); st(4, ins.b, v) }; NORMAL
      case 0x3f => push(memPages.toLong); NORMAL                 // memory.size
      case 0x40 => // memory.grow
        val delta = pop().toInt
        if (delta < 0 || memPages + delta > memMax) push(-1L)
        else {
          val old = memPages
          memPages += delta
          mem = java.util.Arrays.copyOf(mem, memPages * PageSize)
          push(old.toLong)
        }
        NORMAL

      // ── consts ───────────────────────────────────────────────────────
      case 0x41 | 0x42 | 0x43 | 0x44 => push(ins.a); NORMAL

      // ── i32 compare/arith ───────────────────────────────────────────
      case 0x45 => push(b2l(pop().toInt == 0)); NORMAL
      case 0x46 => i32cmp(_ == _)
      case 0x47 => i32cmp(_ != _)
      case 0x48 => i32cmp(_ < _)
      case 0x49 => i32cmp((a, b) => Integer.compareUnsigned(a, b) < 0)
      case 0x4a => i32cmp(_ > _)
      case 0x4b => i32cmp((a, b) => Integer.compareUnsigned(a, b) > 0)
      case 0x4c => i32cmp(_ <= _)
      case 0x4d => i32cmp((a, b) => Integer.compareUnsigned(a, b) <= 0)
      case 0x4e => i32cmp(_ >= _)
      case 0x4f => i32cmp((a, b) => Integer.compareUnsigned(a, b) >= 0)
      case 0x50 => push(b2l(pop() == 0L)); NORMAL
      case 0x51 => i64cmp(_ == _)
      case 0x52 => i64cmp(_ != _)
      case 0x53 => i64cmp(_ < _)
      case 0x54 => i64cmp((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      case 0x55 => i64cmp(_ > _)
      case 0x56 => i64cmp((a, b) => java.lang.Long.compareUnsigned(a, b) > 0)
      case 0x57 => i64cmp(_ <= _)
      case 0x58 => i64cmp((a, b) => java.lang.Long.compareUnsigned(a, b) <= 0)
      case 0x59 => i64cmp(_ >= _)
      case 0x5a => i64cmp((a, b) => java.lang.Long.compareUnsigned(a, b) >= 0)
      case 0x5b => f32cmp(_ == _)
      case 0x5c => f32cmp(_ != _)
      case 0x5d => f32cmp(_ < _)
      case 0x5e => f32cmp(_ > _)
      case 0x5f => f32cmp(_ <= _)
      case 0x60 => f32cmp(_ >= _)
      case 0x61 => f64cmp(_ == _)
      case 0x62 => f64cmp(_ != _)
      case 0x63 => f64cmp(_ < _)
      case 0x64 => f64cmp(_ > _)
      case 0x65 => f64cmp(_ <= _)
      case 0x66 => f64cmp(_ >= _)
      case 0x67 => push(Integer.numberOfLeadingZeros(pop().toInt).toLong); NORMAL
      case 0x68 => push(Integer.numberOfTrailingZeros(pop().toInt).toLong); NORMAL
      case 0x69 => push(Integer.bitCount(pop().toInt).toLong); NORMAL
      case 0x6a => i32bin(_ + _)
      case 0x6b => i32bin(_ - _)
      case 0x6c => i32bin(_ * _)
      case 0x6d => i32bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        if (a == Int.MinValue && b == -1) throw new Trap("integer overflow")
        a / b }
      case 0x6e => i32bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        Integer.divideUnsigned(a, b) }
      case 0x6f => i32bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        if (a == Int.MinValue && b == -1) 0 else a % b }
      case 0x70 => i32bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        Integer.remainderUnsigned(a, b) }
      case 0x71 => i32bin(_ & _)
      case 0x72 => i32bin(_ | _)
      case 0x73 => i32bin(_ ^ _)
      case 0x74 => i32bin((a, b) => a << (b & 31))
      case 0x75 => i32bin((a, b) => a >> (b & 31))
      case 0x76 => i32bin((a, b) => a >>> (b & 31))
      case 0x77 => i32bin((a, b) => Integer.rotateLeft(a, b))
      case 0x78 => i32bin((a, b) => Integer.rotateRight(a, b))
      case 0x79 => push(java.lang.Long.numberOfLeadingZeros(pop()).toLong); NORMAL
      case 0x7a => push(java.lang.Long.numberOfTrailingZeros(pop()).toLong); NORMAL
      case 0x7b => push(java.lang.Long.bitCount(pop()).toLong); NORMAL
      case 0x7c => i64bin(_ + _)
      case 0x7d => i64bin(_ - _)
      case 0x7e => i64bin(_ * _)
      case 0x7f => i64bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        if (a == Long.MinValue && b == -1L) throw new Trap("integer overflow")
        a / b }
      case 0x80 => i64bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        java.lang.Long.divideUnsigned(a, b) }
      case 0x81 => i64bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        if (a == Long.MinValue && b == -1L) 0L else a % b }
      case 0x82 => i64bin { (a, b) =>
        if (b == 0) throw new Trap("integer divide by zero")
        java.lang.Long.remainderUnsigned(a, b) }
      case 0x83 => i64bin(_ & _)
      case 0x84 => i64bin(_ | _)
      case 0x85 => i64bin(_ ^ _)
      case 0x86 => i64bin((a, b) => a << (b & 63))
      case 0x87 => i64bin((a, b) => a >> (b & 63))
      case 0x88 => i64bin((a, b) => a >>> (b & 63))
      case 0x89 => i64bin((a, b) => java.lang.Long.rotateLeft(a, (b & 63).toInt))
      case 0x8a => i64bin((a, b) => java.lang.Long.rotateRight(a, (b & 63).toInt))

      // ── f32 arith ────────────────────────────────────────────────────
      case 0x8b => f32un(math.abs)
      case 0x8c => f32un(x => -x)
      case 0x8d => f32un(x => math.ceil(x.toDouble).toFloat)
      case 0x8e => f32un(x => math.floor(x.toDouble).toFloat)
      case 0x8f => f32un(x => x.toDouble match {
        case d if d.isNaN || d.isInfinite => x
        case d if d < 0 => math.ceil(d).toFloat
        case d => math.floor(d).toFloat })
      case 0x90 => f32un(x => math.rint(x.toDouble).toFloat)
      case 0x91 => f32un(x => math.sqrt(x.toDouble).toFloat)
      case 0x92 => f32bin(_ + _)
      case 0x93 => f32bin(_ - _)
      case 0x94 => f32bin(_ * _)
      case 0x95 => f32bin(_ / _)
      case 0x96 => f32bin((a, b) =>
        if (a.isNaN || b.isNaN) Float.NaN else math.min(a, b))
      case 0x97 => f32bin((a, b) =>
        if (a.isNaN || b.isNaN) Float.NaN else math.max(a, b))
      case 0x98 => f32bin((a, b) => java.lang.Math.copySign(a, b))

      // ── f64 arith ────────────────────────────────────────────────────
      case 0x99 => f64un(math.abs)
      case 0x9a => f64un(x => -x)
      case 0x9b => f64un(math.ceil)
      case 0x9c => f64un(math.floor)
      case 0x9d => f64un(d =>
        if (d.isNaN || d.isInfinite) d
        else if (d < 0) math.ceil(d) else math.floor(d))
      case 0x9e => f64un(math.rint)
      case 0x9f => f64un(math.sqrt)
      case 0xa0 => f64bin(_ + _)
      case 0xa1 => f64bin(_ - _)
      case 0xa2 => f64bin(_ * _)
      case 0xa3 => f64bin(_ / _)
      case 0xa4 => f64bin((a, b) =>
        if (a.isNaN || b.isNaN) Double.NaN else math.min(a, b))
      case 0xa5 => f64bin((a, b) =>
        if (a.isNaN || b.isNaN) Double.NaN else math.max(a, b))
      case 0xa6 => f64bin((a, b) => java.lang.Math.copySign(a, b))

      // ── conversions ──────────────────────────────────────────────────
      case 0xa7 => push(pop().toInt.toLong); NORMAL // i32.wrap_i64
      case 0xa8 => push(truncToI32(f32(pop()).toDouble, signed = true)); NORMAL
      case 0xa9 => push(truncToI32(f32(pop()).toDouble, signed = false)); NORMAL
      case 0xaa => push(truncToI32(f64(pop()), signed = true)); NORMAL
      case 0xab => push(truncToI32(f64(pop()), signed = false)); NORMAL
      case 0xac => push(pop().toInt.toLong); NORMAL              // i64.extend_i32_s
      case 0xad => push(pop() & 0xffffffffL); NORMAL             // i64.extend_i32_u
      case 0xae => push(truncToI64(f32(pop()).toDouble, signed = true)); NORMAL
      case 0xaf => push(truncToI64(f32(pop()).toDouble, signed = false)); NORMAL
      case 0xb0 => push(truncToI64(f64(pop()), signed = true)); NORMAL
      case 0xb1 => push(truncToI64(f64(pop()), signed = false)); NORMAL
      case 0xb2 => push(bits32(pop().toInt.toFloat)); NORMAL     // f32.convert_i32_s
      case 0xb3 => push(bits32((pop() & 0xffffffffL).toFloat)); NORMAL
      case 0xb4 => push(bits32(pop().toFloat)); NORMAL
      case 0xb5 => push(bits32(u64ToDouble(pop()).toFloat)); NORMAL
      case 0xb6 => push(bits32(f64(pop()).toFloat)); NORMAL      // f32.demote_f64
      case 0xb7 => push(bits64(pop().toInt.toDouble)); NORMAL
      case 0xb8 => push(bits64((pop() & 0xffffffffL).toDouble)); NORMAL
      case 0xb9 => push(bits64(pop().toDouble)); NORMAL
      case 0xba => push(bits64(u64ToDouble(pop()))); NORMAL
      case 0xbb => push(bits64(f32(pop()).toDouble)); NORMAL     // f64.promote_f32
      case 0xbc => push(pop().toInt.toLong); NORMAL              // i32.reinterpret_f32 (i32 is sign-extended)
      case 0xbd => NORMAL                                        // i64.reinterpret_f64: identity
      case 0xbe => push(pop() & 0xffffffffL); NORMAL             // f32.reinterpret_i32
      case 0xbf => NORMAL                                        // f64.reinterpret_i64

      // ── sign extension ───────────────────────────────────────────────
      case 0xc0 => push(pop().toByte.toLong); NORMAL
      case 0xc1 => push(pop().toShort.toLong); NORMAL
      case 0xc2 => push(pop().toByte.toLong); NORMAL
      case 0xc3 => push(pop().toShort.toLong); NORMAL
      case 0xc4 => push(pop().toInt.toLong); NORMAL

      // ── 0xFC saturating truncation ───────────────────────────────────
      case 0xfc00 => push(satI32(f32(pop()).toDouble, signed = true)); NORMAL
      case 0xfc01 => push(satI32(f32(pop()).toDouble, signed = false)); NORMAL
      case 0xfc02 => push(satI32(f64(pop()), signed = true)); NORMAL
      case 0xfc03 => push(satI32(f64(pop()), signed = false)); NORMAL
      case 0xfc04 => push(satI64(f32(pop()).toDouble, signed = true)); NORMAL
      case 0xfc05 => push(satI64(f32(pop()).toDouble, signed = false)); NORMAL
      case 0xfc06 => push(satI64(f64(pop()), signed = true)); NORMAL
      case 0xfc07 => push(satI64(f64(pop()), signed = false)); NORMAL

      // ── 0xFC bulk memory (memory.* / data.drop / table.*) ────────────
      case 0xfc08 => // memory.init dataidx
        val n = pop().toInt; val s = pop().toInt; val d = pop().toInt
        val seg = module.datas(ins.a.toInt)
        val src = if (droppedData(ins.a.toInt)) Array.emptyByteArray
                  else seg.bytes
        if (s < 0 || n < 0 || s.toLong + n > src.length ||
            d < 0 || d.toLong + n > mem.length)
          throw new Trap("memory.init out of bounds")
        System.arraycopy(src, s, mem, d, n)
        NORMAL
      case 0xfc09 => droppedData(ins.a.toInt) = true; NORMAL // data.drop
      case 0xfc0a => // memory.copy (overlap-safe per spec)
        val n = pop().toInt; val s = pop().toInt; val d = pop().toInt
        if (s < 0 || d < 0 || n < 0 || s.toLong + n > mem.length ||
            d.toLong + n > mem.length)
          throw new Trap("memory.copy out of bounds")
        System.arraycopy(mem, s, mem, d, n) // arraycopy is overlap-safe
        NORMAL
      case 0xfc0b => // memory.fill
        val n = pop().toInt; val v = pop().toByte; val d = pop().toInt
        if (d < 0 || n < 0 || d.toLong + n > mem.length)
          throw new Trap("memory.fill out of bounds")
        java.util.Arrays.fill(mem, d, d + n, v)
        NORMAL
      case 0xfc0c => // table.init elemidx
        val n = pop().toInt; val s = pop().toInt; val d = pop().toInt
        val seg = module.elems(ins.a.toInt)
        val src = if (droppedElems(ins.a.toInt)) Vector.empty[Int]
                  else seg.funcs
        if (s < 0 || n < 0 || s.toLong + n > src.length ||
            d < 0 || d.toLong + n > table.length)
          throw new Trap("table.init out of bounds")
        var i = 0
        while (i < n) { table(d + i) = src(s + i); i += 1 }
        NORMAL
      case 0xfc0d => droppedElems(ins.a.toInt) = true; NORMAL // elem.drop
      case 0xfc0e => // table.copy
        val n = pop().toInt; val s = pop().toInt; val d = pop().toInt
        if (s < 0 || d < 0 || n < 0 || s.toLong + n > table.length ||
            d.toLong + n > table.length)
          throw new Trap("table.copy out of bounds")
        System.arraycopy(table, s, table, d, n)
        NORMAL
      case 0xfc0f => // table.grow (ref null only — funcs are ints here)
        val delta = pop().toInt; val _ref = pop() // ref.null funcref
        val old = table.length
        if (delta < 0 || old.toLong + delta > tableMax) push(-1L)
        else {
          val grown = Array.fill(old + delta)(-1)
          System.arraycopy(table, 0, grown, 0, old)
          table = grown
          push(old.toLong)
        }
        NORMAL
      case 0xfc10 => push(table.length.toLong); NORMAL // table.size
      case 0xfc11 => // table.fill
        val n = pop().toInt; val v = pop().toInt; val d = pop().toInt
        if (d < 0 || n < 0 || d.toLong + n > table.length)
          throw new Trap("table.fill out of bounds")
        java.util.Arrays.fill(table, d, d + n, v)
        NORMAL

      case op =>
        if ((op & 0xff00) == 0xfd00) execSimd(ins)
        else throw new Trap(f"unimplemented opcode 0x$op%x")
    }

    /** SIMD (0xFD-prefixed) dispatch, split from [[exec]] so both
      * methods stay under HotSpot's huge-method threshold and each
      * compiles to a real switch (a guard case in the main match
      * would forbid switch compilation of the per-instruction hot
      * path entirely — measured 17x on the wasm gates).
      */
    private def execSimd(ins: Instr): Int = (ins.op: @annotation.switch) match {
      case 0xfd00 => // v128.load
        val addr = (pop() & 0xffffffffL) + ins.b
        if (addr < 0 || addr + 16 > mem.length)
          throw new Trap(s"out of bounds memory access: $addr+16")
        pushV(java.util.Arrays.copyOfRange(mem, addr.toInt, addr.toInt + 16))
        NORMAL
      case 0xfd01 | 0xfd02 | 0xfd03 | 0xfd04 | 0xfd05 | 0xfd06 =>
        // load extend: 8x8 / 16x4 / 32x2, signed/unsigned halves
        val sub = ins.op & 0xff
        val srcSz = 1 << ((sub - 1) / 2) // 1, 2, 4
        val signed = sub % 2 == 1
        val half = ld(8, ins.b) // pops addr; 8 source bytes
        val r = new Array[Byte](16)
        var j = 0
        val n = 8 / srcSz
        while (j < n) {
          var v = 0L
          var i = 0
          while (i < srcSz) {
            v |= ((half >>> (8 * (srcSz * j + i))) & 0xffL) << (8 * i); i += 1
          }
          if (signed) {
            val bits = 8 * srcSz
            v = (v << (64 - bits)) >> (64 - bits)
          }
          putLane(r, srcSz * 2, j, v)
          j += 1
        }
        pushV(r)
        NORMAL
      case 0xfd07 | 0xfd08 | 0xfd09 | 0xfd0a => // loadN_splat
        val sz = 1 << ((ins.op & 0xff) - 7)
        val v = ld(sz, ins.b)
        val r = new Array[Byte](16)
        var j = 0
        while (j < 16 / sz) { putLane(r, sz, j, v); j += 1 }
        pushV(r)
        NORMAL
      case 0xfd54 | 0xfd55 | 0xfd56 | 0xfd57 => // v128.loadN_lane
        val sz = 1 << ((ins.op & 0xff) - 84)
        val lane = ins.table.head
        val v = popV()
        val x = ld(sz, ins.b) // pops addr
        val r = java.util.Arrays.copyOf(v, 16)
        putLane(r, sz, lane, x)
        pushV(r)
        NORMAL
      case 0xfd58 | 0xfd59 | 0xfd5a | 0xfd5b => // v128.storeN_lane
        val sz = 1 << ((ins.op & 0xff) - 88)
        val lane = ins.table.head
        val v = popV()
        st(sz, ins.b, getLaneU(v, sz, lane)) // pops addr
        NORMAL
      case 0xfd5c | 0xfd5d => // v128.load32_zero / load64_zero
        val sz = if ((ins.op & 0xff) == 92) 4 else 8
        val v = ld(sz, ins.b)
        val r = new Array[Byte](16)
        putLane(r, sz, 0, v)
        pushV(r)
        NORMAL
      case 0xfd0b => // v128.store
        val v = popV()
        val addr = (pop() & 0xffffffffL) + ins.b
        if (addr < 0 || addr + 16 > mem.length)
          throw new Trap(s"out of bounds memory access: $addr+16")
        System.arraycopy(v, 0, mem, addr.toInt, 16)
        NORMAL
      case 0xfd0c => // v128.const (16-byte immediate in a/b, LE)
        val bytes = new Array[Byte](16)
        var i = 0
        while (i < 8) {
          bytes(i) = (ins.a >>> (8 * i)).toByte
          bytes(8 + i) = (ins.b >>> (8 * i)).toByte
          i += 1
        }
        pushV(bytes)
        NORMAL
      case 0xfd0d => // i8x16.shuffle (16 lane-index immediates in a/b)
        val y = popV(); val x = popV()
        val r = new Array[Byte](16)
        var i = 0
        while (i < 16) {
          val sel = (if (i < 8) (ins.a >>> (8 * i)) else (ins.b >>> (8 * (i - 8)))).toInt & 0xff
          r(i) = if (sel < 16) x(sel) else y(sel - 16)
          i += 1
        }
        pushV(r)
        NORMAL
      case 0xfd0e => // i8x16.swizzle
        val s = popV(); val x = popV()
        val r = new Array[Byte](16)
        var i = 0
        while (i < 16) {
          val sel = s(i) & 0xff
          r(i) = if (sel < 16) x(sel) else 0
          i += 1
        }
        pushV(r)
        NORMAL
      case 0xfd0f | 0xfd10 | 0xfd11 | 0xfd12 => // iNxM.splat
        val sz = 1 << ((ins.op & 0xff) - 0x0f)
        val v = pop()
        val r = new Array[Byte](16)
        var j = 0
        while (j < 16 / sz) { putLane(r, sz, j, v); j += 1 }
        pushV(r)
        NORMAL
      case 0xfd15 => push(getLaneS(popV(), 1, ins.a.toInt)); NORMAL // i8x16.extract_lane_s
      case 0xfd16 => push(getLaneU(popV(), 1, ins.a.toInt)); NORMAL // _u
      case 0xfd17 => vReplaceLane(1, ins.a.toInt)                   // i8x16.replace_lane
      case 0xfd18 => push(getLaneS(popV(), 2, ins.a.toInt)); NORMAL // i16x8.extract_lane_s
      case 0xfd19 => push(getLaneU(popV(), 2, ins.a.toInt)); NORMAL
      case 0xfd1a => vReplaceLane(2, ins.a.toInt)
      case 0xfd1b => push(getLaneS(popV(), 4, ins.a.toInt)); NORMAL // i32x4.extract_lane
      case 0xfd1c => vReplaceLane(4, ins.a.toInt)
      case 0xfd1d => push(getLaneS(popV(), 8, ins.a.toInt)); NORMAL // i64x2.extract_lane
      case 0xfd1e => vReplaceLane(8, ins.a.toInt)
      // integer lane compares (result lanes all-ones / all-zeros)
      case 0xfd23 => vCmp(1)(_ == _)                                       // i8x16.eq
      case 0xfd24 => vCmp(1)(_ != _)                                       // i8x16.ne
      case 0xfd25 => vCmp(1)(_ < _)                                        // lt_s
      case 0xfd26 => vCmp(1)((a, b) => (a & 0xff) < (b & 0xff))            // lt_u
      case 0xfd27 => vCmp(1)(_ > _)                                        // gt_s
      case 0xfd28 => vCmp(1)((a, b) => (a & 0xff) > (b & 0xff))            // gt_u
      case 0xfd29 => vCmp(1)(_ <= _)                                       // le_s
      case 0xfd2a => vCmp(1)((a, b) => (a & 0xff) <= (b & 0xff))           // le_u
      case 0xfd2b => vCmp(1)(_ >= _)                                       // ge_s
      case 0xfd2c => vCmp(1)((a, b) => (a & 0xff) >= (b & 0xff))           // ge_u
      case 0xfd2d => vCmp(2)(_ == _)                                       // i16x8.eq
      case 0xfd2e => vCmp(2)(_ != _)
      case 0xfd2f => vCmp(2)(_ < _)
      case 0xfd30 => vCmp(2)((a, b) => (a & 0xffff) < (b & 0xffff))
      case 0xfd31 => vCmp(2)(_ > _)
      case 0xfd32 => vCmp(2)((a, b) => (a & 0xffff) > (b & 0xffff))
      case 0xfd33 => vCmp(2)(_ <= _)
      case 0xfd34 => vCmp(2)((a, b) => (a & 0xffff) <= (b & 0xffff))
      case 0xfd35 => vCmp(2)(_ >= _)
      case 0xfd36 => vCmp(2)((a, b) => (a & 0xffff) >= (b & 0xffff))
      case 0xfd37 => vCmp(4)(_ == _)                                       // i32x4.eq
      case 0xfd38 => vCmp(4)(_ != _)
      case 0xfd39 => vCmp(4)(_ < _)
      case 0xfd3a => vCmp(4)((a, b) => (a & 0xffffffffL) < (b & 0xffffffffL))
      case 0xfd3b => vCmp(4)(_ > _)
      case 0xfd3c => vCmp(4)((a, b) => (a & 0xffffffffL) > (b & 0xffffffffL))
      case 0xfd3d => vCmp(4)(_ <= _)
      case 0xfd3e => vCmp(4)((a, b) => (a & 0xffffffffL) <= (b & 0xffffffffL))
      case 0xfd3f => vCmp(4)(_ >= _)
      case 0xfd40 => vCmp(4)((a, b) => (a & 0xffffffffL) >= (b & 0xffffffffL))
      // bitwise
      case 0xfd4d => // v128.not
        val x = popV(); val r = new Array[Byte](16)
        var i = 0
        while (i < 16) { r(i) = (~x(i)).toByte; i += 1 }
        pushV(r); NORMAL
      case 0xfd4e => vBits((a, b) => (a & b).toByte)                // v128.and
      case 0xfd4f => vBits((a, b) => (a & ~b).toByte)               // v128.andnot
      case 0xfd50 => vBits((a, b) => (a | b).toByte)                // v128.or
      case 0xfd51 => vBits((a, b) => (a ^ b).toByte)                // v128.xor
      case 0xfd52 => // v128.bitselect
        val c = popV(); val y = popV(); val x = popV()
        val r = new Array[Byte](16)
        var i = 0
        while (i < 16) { r(i) = ((x(i) & c(i)) | (y(i) & ~c(i))).toByte; i += 1 }
        pushV(r); NORMAL
      case 0xfd53 => // v128.any_true
        val x = popV()
        push(b2l(x.exists(_ != 0))); NORMAL
      // i8x16 unary/arith
      case 0xfd60 => vUnop(1)(a => math.abs(a))                     // i8x16.abs (wraps at -128 via truncation)
      case 0xfd61 => vUnop(1)(a => -a)                              // i8x16.neg
      case 0xfd62 => vUnop(1)(a => java.lang.Long.bitCount(a & 0xff).toLong) // popcnt
      case 0xfd63 => vAllTrue(1)
      case 0xfd64 => vBitmask(1)
      case 0xfd6b => vShift(1)((a, s) => a << s)                    // i8x16.shl
      case 0xfd6c => vShift(1)((a, s) => a >> s)                    // shr_s
      case 0xfd6d => vShift(1)((a, s) => (a & 0xff) >>> s)          // shr_u
      case 0xfd6e => vBinop(1)(_ + _)                               // i8x16.add
      case 0xfd71 => vBinop(1)(_ - _)                               // i8x16.sub
      case 0xfd76 => vBinop(1)(math.min)                            // min_s
      case 0xfd77 => vBinop(1)((a, b) => math.min(a & 0xff, b & 0xff)) // min_u
      case 0xfd78 => vBinop(1)(math.max)                            // max_s
      case 0xfd79 => vBinop(1)((a, b) => math.max(a & 0xff, b & 0xff)) // max_u
      // i16x8
      case 0xfd83 => vAllTrue(2)
      case 0xfd84 => vBitmask(2)
      case 0xfd8b => vShift(2)((a, s) => a << s)
      case 0xfd8c => vShift(2)((a, s) => a >> s)
      case 0xfd8d => vShift(2)((a, s) => (a & 0xffff) >>> s)
      case 0xfd8e => vBinop(2)(_ + _)                               // i16x8.add
      case 0xfd91 => vBinop(2)(_ - _)                               // i16x8.sub
      case 0xfd95 => vBinop(2)(_ * _)                               // i16x8.mul
      // i32x4
      case 0xfda3 => vAllTrue(4)
      case 0xfda4 => vBitmask(4)
      case 0xfdab => vShift(4)((a, s) => a << s)
      case 0xfdac => vShift(4)((a, s) => a >> s)
      case 0xfdad => vShift(4)((a, s) => (a & 0xffffffffL) >>> s)
      case 0xfdae => vBinop(4)(_ + _)                               // i32x4.add
      case 0xfdb1 => vBinop(4)(_ - _)                               // i32x4.sub
      case 0xfdb5 => vBinop(4)(_ * _)                               // i32x4.mul
      // i64x2
      case 0xfdc3 => vAllTrue(8)
      case 0xfdc4 => vBitmask(8)
      case 0xfdcb => vShift(8)((a, s) => a << s)
      case 0xfdcc => vShift(8)((a, s) => a >> s)
      case 0xfdcd => vShift(8)((a, s) => a >>> s)
      case 0xfdce => vBinop(8)(_ + _)                               // i64x2.add
      case 0xfdd1 => vBinop(8)(_ - _)                               // i64x2.sub
      case 0xfdd5 => vBinop(8)(_ * _)                               // i64x2.mul

      // float lanes: f32x4 / f64x2 (bits live in lanes; scalars on the
      // operand stack use the interpreter's f32-bits / f64-bits forms)
      case 0xfd13 => // f32x4.splat
        val bits = pop() & 0xffffffffL
        val r = new Array[Byte](16)
        var j = 0
        while (j < 4) { putLane(r, 4, j, bits); j += 1 }
        pushV(r); NORMAL
      case 0xfd14 => // f64x2.splat
        val bits = pop()
        val r = new Array[Byte](16)
        putLane(r, 8, 0, bits); putLane(r, 8, 1, bits)
        pushV(r); NORMAL
      case 0xfd1f => push(getLaneU(popV(), 4, ins.a.toInt)); NORMAL // f32x4.extract_lane
      case 0xfd20 => vReplaceLane(4, ins.a.toInt)                   // f32x4.replace_lane
      case 0xfd21 => push(getLaneU(popV(), 8, ins.a.toInt)); NORMAL // f64x2.extract_lane
      case 0xfd22 => vReplaceLane(8, ins.a.toInt)                   // f64x2.replace_lane
      case 0xfd41 => vF32Cmp(_ == _)                                // f32x4.eq
      case 0xfd42 => vF32Cmp(_ != _)
      case 0xfd43 => vF32Cmp(_ < _)
      case 0xfd44 => vF32Cmp(_ > _)
      case 0xfd45 => vF32Cmp(_ <= _)
      case 0xfd46 => vF32Cmp(_ >= _)
      case 0xfd47 => vF64Cmp(_ == _)                                // f64x2.eq
      case 0xfd48 => vF64Cmp(_ != _)
      case 0xfd49 => vF64Cmp(_ < _)
      case 0xfd4a => vF64Cmp(_ > _)
      case 0xfd4b => vF64Cmp(_ <= _)
      case 0xfd4c => vF64Cmp(_ >= _)
      // narrowing (saturating) and widening integer conversions
      case 0xfd65 => vNarrow(2, signed = true)   // i8x16.narrow_i16x8_s
      case 0xfd66 => vNarrow(2, signed = false)  // i8x16.narrow_i16x8_u
      case 0xfd85 => vNarrow(4, signed = true)   // i16x8.narrow_i32x4_s
      case 0xfd86 => vNarrow(4, signed = false)  // i16x8.narrow_i32x4_u
      case 0xfd87 | 0xfd88 | 0xfd89 | 0xfd8a => // i16x8.extend_*_i8x16_*
        vExtend(1, high = ((ins.op & 0xff) - 135) % 2 == 1,
          signed = (ins.op & 0xff) <= 136)
      case 0xfda7 | 0xfda8 | 0xfda9 | 0xfdaa => // i32x4.extend_*_i16x8_*
        vExtend(2, high = ((ins.op & 0xff) - 167) % 2 == 1,
          signed = (ins.op & 0xff) <= 168)
      case 0xfdc7 | 0xfdc8 | 0xfdc9 | 0xfdca => // i64x2.extend_*_i32x4_*
        vExtend(4, high = ((ins.op & 0xff) - 199) % 2 == 1,
          signed = (ins.op & 0xff) <= 200)
      // saturating add/sub + unsigned rounding average
      case 0xfd6f => vBinop(1)((a, b) => satS(a + b, 1))            // i8x16.add_sat_s
      case 0xfd70 => vBinop(1)((a, b) => satU((a & 0xff) + (b & 0xff), 1))
      case 0xfd72 => vBinop(1)((a, b) => satS(a - b, 1))            // i8x16.sub_sat_s
      case 0xfd73 => vBinop(1)((a, b) => satU((a & 0xff) - (b & 0xff), 1))
      case 0xfd7b => vBinop(1)((a, b) => ((a & 0xff) + (b & 0xff) + 1) >> 1) // i8x16.avgr_u
      case 0xfd8f => vBinop(2)((a, b) => satS(a + b, 2))            // i16x8.add_sat_s
      case 0xfd90 => vBinop(2)((a, b) => satU((a & 0xffff) + (b & 0xffff), 2))
      case 0xfd92 => vBinop(2)((a, b) => satS(a - b, 2))            // i16x8.sub_sat_s
      case 0xfd93 => vBinop(2)((a, b) => satU((a & 0xffff) - (b & 0xffff), 2))
      case 0xfd9b => vBinop(2)((a, b) => ((a & 0xffff) + (b & 0xffff) + 1) >> 1) // i16x8.avgr_u
      // pairwise extending adds, q15 rounding mul, dot product, extmul
      case 0xfd7c => vExtAddPairwise(1, signed = true)  // i16x8.extadd_pairwise_i8x16_s
      case 0xfd7d => vExtAddPairwise(1, signed = false)
      case 0xfd7e => vExtAddPairwise(2, signed = true)  // i32x4.extadd_pairwise_i16x8_s
      case 0xfd7f => vExtAddPairwise(2, signed = false)
      case 0xfd82 => // i16x8.q15mulr_sat_s
        vBinop(2)((a, b) => satS((a * b + (1L << 14)) >> 15, 2))
      case 0xfdba => // i32x4.dot_i16x8_s
        val y = popV(); val x = popV()
        val r = new Array[Byte](16)
        var j = 0
        while (j < 4) {
          val lo = getLaneS(x, 2, 2 * j) * getLaneS(y, 2, 2 * j)
          val hi = getLaneS(x, 2, 2 * j + 1) * getLaneS(y, 2, 2 * j + 1)
          putLane(r, 4, j, lo + hi)
          j += 1
        }
        pushV(r); NORMAL
      case 0xfd9c | 0xfd9d | 0xfd9e | 0xfd9f => // i16x8.extmul_*_i8x16_*
        vExtMul(1, high = ((ins.op & 0xff) - 156) % 2 == 1,
          signed = (ins.op & 0xff) <= 157)
      case 0xfdbc | 0xfdbd | 0xfdbe | 0xfdbf => // i32x4.extmul_*_i16x8_*
        vExtMul(2, high = ((ins.op & 0xff) - 188) % 2 == 1,
          signed = (ins.op & 0xff) <= 189)
      case 0xfddc | 0xfddd | 0xfdde | 0xfddf => // i64x2.extmul_*_i32x4_*
        vExtMul(4, high = ((ins.op & 0xff) - 220) % 2 == 1,
          signed = (ins.op & 0xff) <= 221)
      // i64x2 compares (signed forms only exist in the proposal)
      case 0xfdd6 => vCmp(8)(_ == _) // i64x2.eq
      case 0xfdd7 => vCmp(8)(_ != _)
      case 0xfdd8 => vCmp(8)(_ < _)  // lt_s
      case 0xfdd9 => vCmp(8)(_ > _)  // gt_s
      case 0xfdda => vCmp(8)(_ <= _) // le_s
      case 0xfddb => vCmp(8)(_ >= _) // ge_s
      case 0xfd96 => vBinop(2)(math.min)                            // i16x8.min_s
      case 0xfd97 => vBinop(2)((a, b) => math.min(a & 0xffff, b & 0xffff))
      case 0xfd98 => vBinop(2)(math.max)                            // i16x8.max_s
      case 0xfd99 => vBinop(2)((a, b) => math.max(a & 0xffff, b & 0xffff))
      case 0xfda0 => vUnop(4)(math.abs)                             // i32x4.abs
      case 0xfda1 => vUnop(4)(a => -a)                              // i32x4.neg
      case 0xfd80 => vUnop(2)(math.abs)                             // i16x8.abs
      case 0xfd81 => vUnop(2)(a => -a)                              // i16x8.neg
      case 0xfdc0 => vUnop(8)(math.abs)                             // i64x2.abs
      case 0xfdc1 => vUnop(8)(a => -a)                              // i64x2.neg
      case 0xfdb6 => vBinop(4)(math.min)                            // i32x4.min_s
      case 0xfdb7 => vBinop(4)((a, b) =>                            // i32x4.min_u
        math.min(a & 0xffffffffL, b & 0xffffffffL))
      case 0xfdb8 => vBinop(4)(math.max)                            // i32x4.max_s
      case 0xfdb9 => vBinop(4)((a, b) =>                            // i32x4.max_u
        math.max(a & 0xffffffffL, b & 0xffffffffL))
      // f32x4 rounding / arithmetic
      case 0xfd67 => vF32Unop(x => math.ceil(x).toFloat)            // f32x4.ceil
      case 0xfd68 => vF32Unop(x => math.floor(x).toFloat)           // floor
      case 0xfd69 => vF32Unop(x =>                                  // trunc
        (if (x < 0) math.ceil(x) else math.floor(x)).toFloat)
      case 0xfd6a => vF32Unop(x => math.rint(x).toFloat)            // nearest
      case 0xfde0 => vF32Unop(math.abs)                             // f32x4.abs
      case 0xfde1 => vF32Unop(x => -x)                              // neg
      case 0xfde3 => vF32Unop(x => math.sqrt(x).toFloat)            // sqrt
      case 0xfde4 => vF32Binop(_ + _)                               // add
      case 0xfde5 => vF32Binop(_ - _)                               // sub
      case 0xfde6 => vF32Binop(_ * _)                               // mul
      case 0xfde7 => vF32Binop(_ / _)                               // div
      case 0xfde8 => vF32Binop((x, y) =>                            // min (NaN-propagating)
        if (x.isNaN || y.isNaN) Float.NaN else math.min(x, y))
      case 0xfde9 => vF32Binop((x, y) =>
        if (x.isNaN || y.isNaN) Float.NaN else math.max(x, y))
      case 0xfdea => vF32Binop((x, y) => if (y < x) y else x)       // pmin
      case 0xfdeb => vF32Binop((x, y) => if (x < y) y else x)       // pmax
      // f64x2 rounding / arithmetic
      case 0xfd74 => vF64Unop(math.ceil)                            // f64x2.ceil
      case 0xfd75 => vF64Unop(math.floor)                           // floor
      case 0xfd7a => vF64Unop(x =>                                  // trunc
        if (x < 0) math.ceil(x) else math.floor(x))
      case 0xfd94 => vF64Unop(math.rint)                            // nearest
      case 0xfdec => vF64Unop(math.abs)                             // f64x2.abs
      case 0xfded => vF64Unop(x => -x)                              // neg
      case 0xfdef => vF64Unop(math.sqrt)                            // sqrt
      case 0xfdf0 => vF64Binop(_ + _)                               // add
      case 0xfdf1 => vF64Binop(_ - _)                               // sub
      case 0xfdf2 => vF64Binop(_ * _)                               // mul
      case 0xfdf3 => vF64Binop(_ / _)                               // div
      case 0xfdf4 => vF64Binop((x, y) =>
        if (x.isNaN || y.isNaN) Double.NaN else math.min(x, y))
      case 0xfdf5 => vF64Binop((x, y) =>
        if (x.isNaN || y.isNaN) Double.NaN else math.max(x, y))
      case 0xfdf6 => vF64Binop((x, y) => if (y < x) y else x)       // pmin
      case 0xfdf7 => vF64Binop((x, y) => if (x < y) y else x)       // pmax
      // float ⇄ int conversions, demote/promote
      case 0xfd5e => // f32x4.demote_f64x2_zero
        val x = popV(); val r = new Array[Byte](16)
        var j = 0
        while (j < 2) {
          val f = java.lang.Double.longBitsToDouble(getLaneU(x, 8, j)).toFloat
          putLane(r, 4, j, java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
          j += 1
        }
        pushV(r); NORMAL
      case 0xfd5f => // f64x2.promote_low_f32x4
        val x = popV(); val r = new Array[Byte](16)
        var j = 0
        while (j < 2) {
          val d = java.lang.Float.intBitsToFloat(getLaneU(x, 4, j).toInt).toDouble
          putLane(r, 8, j, java.lang.Double.doubleToLongBits(d))
          j += 1
        }
        pushV(r); NORMAL
      case 0xfdf8 => // i32x4.trunc_sat_f32x4_s
        vF32ToI32(f => if (f.isNaN) 0L
          else math.max(Int.MinValue.toDouble,
            math.min(Int.MaxValue.toDouble, f.toDouble)).toLong)
      case 0xfdf9 => // i32x4.trunc_sat_f32x4_u
        vF32ToI32(f => if (f.isNaN) 0L
          else math.max(0.0, math.min(4294967295.0, f.toDouble)).toLong)
      case 0xfdfa => // f32x4.convert_i32x4_s
        vI32ToF32(v => v.toInt.toFloat)
      case 0xfdfb => // f32x4.convert_i32x4_u
        vI32ToF32(v => (v & 0xffffffffL).toFloat)
      case 0xfdfc => // i32x4.trunc_sat_f64x2_s_zero
        val x = popV(); val r = new Array[Byte](16)
        var j = 0
        while (j < 2) {
          val d = java.lang.Double.longBitsToDouble(getLaneU(x, 8, j))
          val v = if (d.isNaN) 0L
            else math.max(Int.MinValue.toDouble,
              math.min(Int.MaxValue.toDouble, d)).toLong
          putLane(r, 4, j, v & 0xffffffffL); j += 1
        }
        pushV(r); NORMAL
      case 0xfdfd => // i32x4.trunc_sat_f64x2_u_zero
        val x = popV(); val r = new Array[Byte](16)
        var j = 0
        while (j < 2) {
          val d = java.lang.Double.longBitsToDouble(getLaneU(x, 8, j))
          val v = if (d.isNaN) 0L
            else math.max(0.0, math.min(4294967295.0, d)).toLong
          putLane(r, 4, j, v & 0xffffffffL); j += 1
        }
        pushV(r); NORMAL
      case 0xfdfe => // f64x2.convert_low_i32x4_s
        val x = popV(); val r = new Array[Byte](16)
        var j = 0
        while (j < 2) {
          putLane(r, 8, j, java.lang.Double.doubleToLongBits(
            getLaneS(x, 4, j).toDouble)); j += 1
        }
        pushV(r); NORMAL
      case 0xfdff => // f64x2.convert_low_i32x4_u
        val x = popV(); val r = new Array[Byte](16)
        var j = 0
        while (j < 2) {
          putLane(r, 8, j, java.lang.Double.doubleToLongBits(
            getLaneU(x, 4, j).toDouble)); j += 1
        }
        pushV(r); NORMAL

      case op =>
        // the MVP surface is complete; only reserved encodings land here
        throw new Trap(f"simd opcode 0xFD ${op & 0xff}%d is a reserved " +
          "encoding (not part of the SIMD MVP)")
    }

    // ── v128 lane helpers: little-endian lanes of size 1/2/4/8 bytes ──
    private def getLaneU(v: Array[Byte], sz: Int, j: Int): Long = {
      var out = 0L
      var i = 0
      while (i < sz) { out |= (v(sz * j + i) & 0xffL) << (8 * i); i += 1 }
      out
    }
    private def getLaneS(v: Array[Byte], sz: Int, j: Int): Long = {
      val bits = 8 * sz
      val u = getLaneU(v, sz, j)
      if (bits == 64) u else (u << (64 - bits)) >> (64 - bits)
    }
    private def putLane(v: Array[Byte], sz: Int, j: Int, x: Long): Unit = {
      var i = 0
      while (i < sz) { v(sz * j + i) = (x >>> (8 * i)).toByte; i += 1 }
    }
    private def vBits(f: (Byte, Byte) => Byte): Int = {
      val y = popV(); val x = popV()
      val r = new Array[Byte](16)
      var i = 0
      while (i < 16) { r(i) = f(x(i), y(i)); i += 1 }
      pushV(r); NORMAL
    }
    private def vBinop(sz: Int)(f: (Long, Long) => Long): Int = {
      val y = popV(); val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 16 / sz) {
        putLane(r, sz, j, f(getLaneS(x, sz, j), getLaneS(y, sz, j))); j += 1
      }
      pushV(r); NORMAL
    }
    private def vUnop(sz: Int)(f: Long => Long): Int = {
      val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 16 / sz) { putLane(r, sz, j, f(getLaneS(x, sz, j))); j += 1 }
      pushV(r); NORMAL
    }
    private def vCmp(sz: Int)(f: (Long, Long) => Boolean): Int =
      vBinop(sz)((a, b) => if (f(a, b)) -1L else 0L)
    private def vShift(sz: Int)(f: (Long, Long) => Long): Int = {
      val s = pop() & (8 * sz - 1) // shift count mod lane width, per spec
      val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 16 / sz) { putLane(r, sz, j, f(getLaneS(x, sz, j), s)); j += 1 }
      pushV(r); NORMAL
    }
    private def vAllTrue(sz: Int): Int = {
      val x = popV()
      var all = true
      var j = 0
      while (j < 16 / sz) { if (getLaneU(x, sz, j) == 0L) all = false; j += 1 }
      push(b2l(all)); NORMAL
    }
    private def vBitmask(sz: Int): Int = {
      val x = popV()
      var m = 0L
      var j = 0
      while (j < 16 / sz) { if (getLaneS(x, sz, j) < 0) m |= 1L << j; j += 1 }
      push(m); NORMAL
    }
    private def vReplaceLane(sz: Int, j: Int): Int = {
      val x = pop()
      val v = popV()
      val r = java.util.Arrays.copyOf(v, 16)
      putLane(r, sz, j, x)
      pushV(r); NORMAL
    }
    // saturate a widened result back into a signed/unsigned lane
    private def satS(v: Long, sz: Int): Long = {
      val max = (1L << (8 * sz - 1)) - 1
      if (v > max) max else if (v < -max - 1) -max - 1 else v
    }
    private def satU(v: Long, sz: Int): Long = {
      val max = (1L << (8 * sz)) - 1
      if (v > max) max else if (v < 0) 0L else v
    }
    private def vNarrow(srcSz: Int, signed: Boolean): Int = {
      val y = popV(); val x = popV()
      val dstSz = srcSz / 2
      val n = 16 / srcSz
      val r = new Array[Byte](16)
      var j = 0
      while (j < n) {
        val v = getLaneS(x, srcSz, j)
        putLane(r, dstSz, j, if (signed) satS(v, dstSz) else satU(v, dstSz))
        j += 1
      }
      j = 0
      while (j < n) {
        val v = getLaneS(y, srcSz, j)
        putLane(r, dstSz, n + j,
          if (signed) satS(v, dstSz) else satU(v, dstSz))
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vExtend(srcSz: Int, high: Boolean, signed: Boolean): Int = {
      val x = popV()
      val dstSz = srcSz * 2
      val n = 16 / dstSz
      val off = if (high) n else 0
      val r = new Array[Byte](16)
      var j = 0
      while (j < n) {
        val v = if (signed) getLaneS(x, srcSz, off + j)
                else getLaneU(x, srcSz, off + j)
        putLane(r, dstSz, j, v)
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vExtAddPairwise(srcSz: Int, signed: Boolean): Int = {
      val x = popV()
      val dstSz = srcSz * 2
      val r = new Array[Byte](16)
      var j = 0
      while (j < 16 / dstSz) {
        val a = if (signed) getLaneS(x, srcSz, 2 * j)
                else getLaneU(x, srcSz, 2 * j)
        val b = if (signed) getLaneS(x, srcSz, 2 * j + 1)
                else getLaneU(x, srcSz, 2 * j + 1)
        putLane(r, dstSz, j, a + b)
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vExtMul(srcSz: Int, high: Boolean, signed: Boolean): Int = {
      val y = popV(); val x = popV()
      val dstSz = srcSz * 2
      val n = 16 / dstSz
      val off = if (high) n else 0
      val r = new Array[Byte](16)
      var j = 0
      while (j < n) {
        val a = if (signed) getLaneS(x, srcSz, off + j)
                else getLaneU(x, srcSz, off + j)
        val b = if (signed) getLaneS(y, srcSz, off + j)
                else getLaneU(y, srcSz, off + j)
        putLane(r, dstSz, j, a * b)
        j += 1
      }
      pushV(r); NORMAL
    }
    private def f32Of(bits: Long): Float =
      java.lang.Float.intBitsToFloat(bits.toInt)
    private def f32Bits(f: Float): Long =
      java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL
    private def vF32Binop(f: (Float, Float) => Float): Int = {
      val y = popV(); val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 4) {
        putLane(r, 4, j, f32Bits(f(f32Of(getLaneU(x, 4, j)),
          f32Of(getLaneU(y, 4, j)))))
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vF32Unop(f: Float => Float): Int = {
      val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 4) {
        putLane(r, 4, j, f32Bits(f(f32Of(getLaneU(x, 4, j))))); j += 1
      }
      pushV(r); NORMAL
    }
    private def vF32Cmp(f: (Float, Float) => Boolean): Int = {
      val y = popV(); val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 4) {
        putLane(r, 4, j, if (f(f32Of(getLaneU(x, 4, j)),
          f32Of(getLaneU(y, 4, j)))) 0xffffffffL else 0L)
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vF64Binop(f: (Double, Double) => Double): Int = {
      val y = popV(); val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 2) {
        putLane(r, 8, j, java.lang.Double.doubleToLongBits(f(
          java.lang.Double.longBitsToDouble(getLaneU(x, 8, j)),
          java.lang.Double.longBitsToDouble(getLaneU(y, 8, j)))))
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vF64Unop(f: Double => Double): Int = {
      val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 2) {
        putLane(r, 8, j, java.lang.Double.doubleToLongBits(
          f(java.lang.Double.longBitsToDouble(getLaneU(x, 8, j)))))
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vF64Cmp(f: (Double, Double) => Boolean): Int = {
      val y = popV(); val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 2) {
        putLane(r, 8, j, if (f(
          java.lang.Double.longBitsToDouble(getLaneU(x, 8, j)),
          java.lang.Double.longBitsToDouble(getLaneU(y, 8, j)))) -1L else 0L)
        j += 1
      }
      pushV(r); NORMAL
    }
    private def vF32ToI32(f: Float => Long): Int = {
      val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 4) {
        putLane(r, 4, j, f(f32Of(getLaneU(x, 4, j))) & 0xffffffffL); j += 1
      }
      pushV(r); NORMAL
    }
    private def vI32ToF32(f: Long => Float): Int = {
      val x = popV()
      val r = new Array[Byte](16)
      var j = 0
      while (j < 4) {
        putLane(r, 4, j, f32Bits(f(getLaneS(x, 4, j)))); j += 1
      }
      pushV(r); NORMAL
    }

    private def invokeByIndexPoppingArgs(fIdx: Int): Array[Long] = {
      val ft = module.typeOf(fIdx)
      val args = new Array[Long](ft.params.length)
      var i = ft.params.length - 1
      while (i >= 0) { args(i) = pop(); i -= 1 }
      invokeByIndex(fIdx, args)
    }

    // memory access: the effective address is u32(dynamic) + u32(offset)
    private def ld(n: Int, offset: Long): Long = {
      val addr = (pop() & 0xffffffffL) + offset
      if (addr < 0 || addr + n > mem.length)
        throw new Trap(s"out of bounds memory access: $addr+$n")
      val base = addr.toInt
      var v = 0L
      var i = 0
      while (i < n) { v |= (mem(base + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    private def st(n: Int, offset: Long, v: Long): Unit = {
      val addr = (pop() & 0xffffffffL) + offset
      if (addr < 0 || addr + n > mem.length)
        throw new Trap(s"out of bounds memory access: $addr+$n")
      val base = addr.toInt
      var i = 0
      while (i < n) { mem(base + i) = (v >>> (8 * i)).toByte; i += 1 }
    }

    private def b2l(b: Boolean): Long = if (b) 1L else 0L
    private def i32cmp(f: (Int, Int) => Boolean): Int = {
      val b = pop().toInt; val a = pop().toInt; push(b2l(f(a, b))); NORMAL }
    private def i64cmp(f: (Long, Long) => Boolean): Int = {
      val b = pop(); val a = pop(); push(b2l(f(a, b))); NORMAL }
    private def f32cmp(f: (Float, Float) => Boolean): Int = {
      val b = f32(pop()); val a = f32(pop()); push(b2l(f(a, b))); NORMAL }
    private def f64cmp(f: (Double, Double) => Boolean): Int = {
      val b = f64(pop()); val a = f64(pop()); push(b2l(f(a, b))); NORMAL }
    private def i32bin(f: (Int, Int) => Int): Int = {
      val b = pop().toInt; val a = pop().toInt; push(f(a, b).toLong); NORMAL }
    private def i64bin(f: (Long, Long) => Long): Int = {
      val b = pop(); val a = pop(); push(f(a, b)); NORMAL }
    private def f32un(f: Float => Float): Int = { push(bits32(f(f32(pop())))); NORMAL }
    private def f32bin(f: (Float, Float) => Float): Int = {
      val b = f32(pop()); val a = f32(pop()); push(bits32(f(a, b))); NORMAL }
    private def f64un(f: Double => Double): Int = { push(bits64(f(f64(pop())))); NORMAL }
    private def f64bin(f: (Double, Double) => Double): Int = {
      val b = f64(pop()); val a = f64(pop()); push(bits64(f(a, b))); NORMAL }
  }

  private def f32(bits: Long): Float = java.lang.Float.intBitsToFloat(bits.toInt)
  private def f64(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)
  private def bits32(v: Float): Long =
    java.lang.Float.floatToRawIntBits(v).toLong & 0xffffffffL
  private def bits64(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)

  private def u64ToDouble(v: Long): Double =
    if (v >= 0) v.toDouble
    else ((v >>> 1) | (v & 1)).toDouble * 2.0

  private def truncToI32(d: Double, signed: Boolean): Long = {
    if (d.isNaN) throw new Trap("invalid conversion to integer")
    val t = if (d < 0) math.ceil(d) else math.floor(d)
    if (signed) {
      if (t < Int.MinValue.toDouble || t > Int.MaxValue.toDouble)
        throw new Trap("integer overflow")
      t.toInt.toLong
    } else {
      if (t < 0 || t > 4294967295.0) throw new Trap("integer overflow")
      t.toLong.toInt.toLong
    }
  }
  private def truncToI64(d: Double, signed: Boolean): Long = {
    if (d.isNaN) throw new Trap("invalid conversion to integer")
    val t = if (d < 0) math.ceil(d) else math.floor(d)
    if (signed) {
      if (t < -9.223372036854776e18 || t >= 9.223372036854776e18)
        throw new Trap("integer overflow")
      t.toLong
    } else {
      if (t < 0 || t >= 1.8446744073709552e19) throw new Trap("integer overflow")
      if (t < 9.223372036854776e18) t.toLong
      else (t - 9.223372036854776e18).toLong | Long.MinValue
    }
  }
  private def satI32(d: Double, signed: Boolean): Long =
    if (d.isNaN) 0L
    else if (signed) math.max(Int.MinValue.toDouble,
      math.min(Int.MaxValue.toDouble, d)).toInt.toLong
    else math.max(0.0, math.min(4294967295.0, d)).toLong.toInt.toLong
  private def satI64(d: Double, signed: Boolean): Long =
    if (d.isNaN) 0L
    else if (signed) {
      if (d <= -9.223372036854776e18) Long.MinValue
      else if (d >= 9.223372036854776e18) Long.MaxValue
      else d.toLong
    } else {
      if (d <= 0) 0L
      else if (d >= 1.8446744073709552e19) -1L
      else if (d < 9.223372036854776e18) d.toLong
      else (d - 9.223372036854776e18).toLong | Long.MinValue
    }
}
