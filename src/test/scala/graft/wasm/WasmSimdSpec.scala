package graft.wasm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import WasmModule.{I32, I64, V128}

/** SIMD proposal (0xFD v128) coverage — the integer MVP subset the
  * interpreter executes: loads/stores, v128.const, shuffle/swizzle,
  * splats, extract/replace lanes, lane compares, bitwise ops,
  * any/all_true, bitmask, shifts and lane arithmetic. Every module is
  * assembled by WasmAsm, executed by WasmInterp against hand-computed
  * lane values, and the full op surface is cross-validated against V8
  * (identical memory image + scalar results) when node is present —
  * the same differential discipline as the bulk-memory and
  * foreign-binary suites. v128 values keep the interpreter's
  * one-slot-per-value invariant via a boxed side table, so the suite
  * also pins v128 flowing through locals and block results.
  */
class WasmSimdSpec extends AnyFunSuite {

  // operand vectors: A spans signed/unsigned-divergent bytes, B mixes
  // boundary values, C is the alternating bitselect mask
  private val A: Array[Byte] = Array(0x00, 0x01, 0x02, 0x03, 0x04, 0x05,
    0x06, 0x07, 0x80, 0x90, 0xa0, 0xb0, 0xc0, 0xd0, 0xe0, 0xff)
    .map(_.toByte)
  private val B: Array[Byte] = Array(0xff, 0x7f, 0x80, 0x01, 0x10, 0x20,
    0x30, 0x40, 0x55, 0xaa, 0x00, 0x11, 0x22, 0x33, 0x44, 0x7e)
    .map(_.toByte)
  private val C: Array[Byte] =
    Array.tabulate(16)(i => if (i % 2 == 0) 0xff.toByte else 0x00.toByte)

  private val resultBase = 64
  private val slots = scala.collection.mutable.LinkedHashMap.empty[String, Int]

  private def f32x4(a: Float, b: Float, c: Float, d: Float): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(a).putFloat(b).putFloat(c).putFloat(d)
    bb.array()
  }
  private def f64x2(a: Double, b: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(a).putDouble(b)
    bb.array()
  }

  /** Build one module running the whole op surface: `run` stores each
    * v128 result at a recorded slot; scalar ops export as functions.
    */
  private def buildModule(): Array[Byte] = {
    slots.clear()
    val m = new WasmAsm.ModuleBuilder
    m.memory(1, exportAs = Some("memory"))
    m.data(0, A); m.data(16, B); m.data(32, C)
    var next = resultBase
    val t0 = m.funcType(Seq(), Seq())
    val run = m.func(t0) { c =>
      def loadA() = c.i32Const(0).v128Load()
      def loadB() = c.i32Const(16).v128Load()
      def loadC() = c.i32Const(32).v128Load()
      def store(name: String)(push: => Unit): Unit = {
        slots(name) = next
        c.i32Const(next)
        push
        c.v128Store()
        next += 16
      }
      store("roundtrip") { loadA() }
      store("const") { c.v128Const(Array.tabulate(16)(i => (0x11 * (i % 8)).toByte)) }
      // lane arithmetic
      store("add8") { loadA(); loadB(); c.simd(110) }
      store("sub8") { loadA(); loadB(); c.simd(113) }
      store("add16") { loadA(); loadB(); c.simd(142) }
      store("sub16") { loadA(); loadB(); c.simd(145) }
      store("mul16") { loadA(); loadB(); c.simd(149) }
      store("add32") { loadA(); loadB(); c.simd(174) }
      store("sub32") { loadA(); loadB(); c.simd(177) }
      store("mul32") { loadA(); loadB(); c.simd(181) }
      store("add64") { loadA(); loadB(); c.simd(206) }
      store("sub64") { loadA(); loadB(); c.simd(209) }
      store("mul64") { loadA(); loadB(); c.simd(213) }
      store("min_s8") { loadA(); loadB(); c.simd(118) }
      store("min_u8") { loadA(); loadB(); c.simd(119) }
      store("max_s8") { loadA(); loadB(); c.simd(120) }
      store("max_u8") { loadA(); loadB(); c.simd(121) }
      // bitwise
      store("and") { loadA(); loadB(); c.simd(78) }
      store("andnot") { loadA(); loadB(); c.simd(79) }
      store("or") { loadA(); loadB(); c.simd(80) }
      store("xor") { loadA(); loadB(); c.simd(81) }
      store("not") { loadA(); c.simd(77) }
      store("bitselect") { loadA(); loadB(); loadC(); c.simd(82) }
      // compares (every i8x16 form + spot checks at wider lanes)
      store("eq8") { loadA(); loadB(); c.simd(35) }
      store("ne8") { loadA(); loadB(); c.simd(36) }
      store("lt_s8") { loadA(); loadB(); c.simd(37) }
      store("lt_u8") { loadA(); loadB(); c.simd(38) }
      store("gt_s8") { loadA(); loadB(); c.simd(39) }
      store("gt_u8") { loadA(); loadB(); c.simd(40) }
      store("le_s8") { loadA(); loadB(); c.simd(41) }
      store("le_u8") { loadA(); loadB(); c.simd(42) }
      store("ge_s8") { loadA(); loadB(); c.simd(43) }
      store("ge_u8") { loadA(); loadB(); c.simd(44) }
      store("eq16") { loadA(); loadB(); c.simd(45) }
      store("lt_s16") { loadA(); loadB(); c.simd(47) }
      store("gt_u16") { loadA(); loadB(); c.simd(50) }
      store("eq32") { loadA(); loadB(); c.simd(55) }
      store("lt_u32") { loadA(); loadB(); c.simd(58) }
      store("ge_s32") { loadA(); loadB(); c.simd(63) }
      // splats
      store("splat8") { c.i32Const(0xa5); c.simd(15) }
      store("splat16") { c.i32Const(0xbeef); c.simd(16) }
      store("splat32") { c.i32Const(0x12345678); c.simd(17) }
      store("splat64") { c.i64Const(0x0123456789abcdefL); c.simd(18) }
      // shuffle (reverse of A) and swizzle (C as selector over A)
      store("shuffle") {
        loadA(); loadB()
        c.i8x16Shuffle(Array.tabulate(16)(i => (15 - i).toByte))
      }
      store("swizzle") { loadA(); loadC(); c.simd(14) }
      // shifts (count deliberately > lane width to pin the mod rule)
      store("shl8") { loadA(); c.i32Const(11); c.simd(107) }
      store("shr_s8") { loadA(); c.i32Const(2); c.simd(108) }
      store("shr_u8") { loadA(); c.i32Const(2); c.simd(109) }
      store("shl16") { loadA(); c.i32Const(5); c.simd(139) }
      store("shr_s32") { loadA(); c.i32Const(7); c.simd(172) }
      store("shl64") { loadA(); c.i32Const(9); c.simd(203) }
      store("shr_u64") { loadA(); c.i32Const(9); c.simd(205) }
      // unary
      store("abs8") { loadA(); c.simd(96) }
      store("neg8") { loadA(); c.simd(97) }
      store("popcnt8") { loadA(); c.simd(98) }
      // replace lanes
      store("repl8") { loadA(); c.i32Const(0x7c); c.simdLane(23, 5) }
      store("repl16") { loadA(); c.i32Const(0x1234); c.simdLane(26, 3) }
      store("repl32") { loadA(); c.i32Const(0xdead); c.simdLane(28, 2) }
      store("repl64") { loadA(); c.i64Const(-2L); c.simdLane(30, 1) }
      // saturating arithmetic + rounding average
      store("addsat_s8") { loadA(); loadB(); c.simd(111) }
      store("addsat_u8") { loadA(); loadB(); c.simd(112) }
      store("subsat_s8") { loadA(); loadB(); c.simd(114) }
      store("subsat_u8") { loadA(); loadB(); c.simd(115) }
      store("avgr_u8") { loadA(); loadB(); c.simd(123) }
      store("addsat_s16") { loadA(); loadB(); c.simd(143) }
      store("subsat_u16") { loadA(); loadB(); c.simd(147) }
      store("avgr_u16") { loadA(); loadB(); c.simd(155) }
      store("minmax16") { loadA(); loadB(); c.simd(150) } // i16x8.min_s
      store("max_u16") { loadA(); loadB(); c.simd(153) }
      store("min_s32") { loadA(); loadB(); c.simd(182) }
      store("max_u32") { loadA(); loadB(); c.simd(185) }
      store("abs16") { loadA(); c.simd(128) }
      store("neg32") { loadA(); c.simd(161) }
      store("abs64") { loadA(); c.simd(192) }
      // narrowing / widening
      store("narrow8s") { loadA(); loadB(); c.simd(101) }
      store("narrow8u") { loadA(); loadB(); c.simd(102) }
      store("narrow16s") { loadA(); loadB(); c.simd(133) }
      store("extlo8s") { loadA(); c.simd(135) }
      store("exthi8s") { loadA(); c.simd(136) }
      store("extlo8u") { loadA(); c.simd(137) }
      store("exthi16u") { loadA(); c.simd(170) }
      store("extlo32s") { loadA(); c.simd(199) }
      store("exthi32u") { loadA(); c.simd(202) }
      // load-shape variants over A's bytes
      store("load8x8_s") { c.i32Const(0); c.v128LoadShape(1) }
      store("load8x8_u") { c.i32Const(0); c.v128LoadShape(2) }
      store("load16x4_s") { c.i32Const(8); c.v128LoadShape(3) }
      store("load32x2_u") { c.i32Const(0); c.v128LoadShape(6) }
      store("load8_splat") { c.i32Const(9); c.v128LoadShape(7) }
      store("load32_splat") { c.i32Const(4); c.v128LoadShape(9) }
      store("load64_splat") { c.i32Const(8); c.v128LoadShape(10) }
      store("load32_zero") { c.i32Const(12); c.v128LoadShape(92) }
      store("load64_zero") { c.i32Const(0); c.v128LoadShape(93) }
      // f32x4 / f64x2: constants assembled inline (no NaN inputs — lane
      // NaN PAYLOADS are impl-defined; ops below never produce one from
      // these operands except where both engines canonicalize)
      def fa() = c.v128Const(f32x4(1.5f, -2.25f, 0.0f, -0.0f))
      def fb() = c.v128Const(f32x4(3.0f, 0.5f, -1.0f, 16.0f))
      def fr() = c.v128Const(f32x4(1.5f, -2.5f, 2.5f, -1.5f))
      def da() = c.v128Const(f64x2(2.5, -7.25))
      def db() = c.v128Const(f64x2(0.5, 3.0))
      store("fadd") { fa(); fb(); c.simd(228) }
      store("fsub") { fa(); fb(); c.simd(229) }
      store("fmul") { fa(); fb(); c.simd(230) }
      store("fdiv") { fa(); fb(); c.simd(231) }
      store("fmin_zeros") { fa(); c.v128Const(f32x4(0.0f, 1.0f, 0.0f, 0.0f))
        c.simd(232) } // min(-0,+0) must be -0
      store("fmax") { fa(); fb(); c.simd(233) }
      store("fpmin") { fa(); fb(); c.simd(234) }
      store("fpmax") { fa(); fb(); c.simd(235) }
      store("fabs") { fa(); c.simd(224) }
      store("fneg") { fa(); c.simd(225) }
      // no NaN-producing inputs in the differential module: a wasm
      // arithmetic NaN's PAYLOAD (incl. sign) is impl-defined — V8 on
      // x86 emits the hardware default QNaN 0xFFC00000 for sqrt(-1),
      // the JVM the canonical 0x7FC00000; both legal. NaN-ness itself
      // is pinned payload-agnostically in the hand-computed test.
      store("fsqrt") { c.v128Const(f32x4(3.0f, 0.5f, 2.25f, 16.0f))
        c.simd(227) }
      store("fceil") { fr(); c.simd(103) }
      store("ffloor") { fr(); c.simd(104) }
      store("ftrunc") { fr(); c.simd(105) }
      store("fnearest") { fr(); c.simd(106) } // ties to even: 2.5 -> 2, -2.5 -> -2
      store("feq") { fa(); fb(); c.simd(65) }
      store("flt") { fa(); fb(); c.simd(67) }
      store("fge") { fa(); fb(); c.simd(70) }
      store("fsplat") { c.f32Const(7.75f); c.simd(19) }
      store("frepl") { fa(); c.f32Const(9.5f); c.simdLane(32, 2) }
      store("fext_splat") { fa(); c.simdLane(31, 1); c.simd(19) } // extract -> splat
      store("dadd") { da(); db(); c.simd(240) }
      store("dmul") { da(); db(); c.simd(242) }
      store("ddiv") { da(); db(); c.simd(243) }
      store("dmin") { da(); db(); c.simd(244) }
      store("dpmax") { da(); db(); c.simd(247) }
      store("dneg") { da(); c.simd(237) }
      store("dsqrt") { db(); c.simd(239) }
      store("dceil") { da(); c.simd(116) }
      store("dfloor") { da(); c.simd(117) }
      store("dtrunc") { da(); c.simd(122) }
      store("dnearest") { c.v128Const(f64x2(2.5, -0.5)); c.simd(148) }
      store("deq") { da(); db(); c.simd(71) }
      store("dlt") { da(); db(); c.simd(73) }
      store("dsplat") { c.f64Const(-3.125); c.simd(20) }
      store("drepl") { da(); c.f64Const(11.0); c.simdLane(34, 0) }
      // conversions
      store("trunc_f32_s") { c.v128Const(f32x4(1.9f, -2.9f, 3e9f, -0.5f))
        c.simd(248) } // saturates lane 2
      store("trunc_f32_u") { c.v128Const(f32x4(1.9f, -2.9f, 3e9f, 0.5f))
        c.simd(249) }
      store("conv_i32_s") { loadA(); c.simd(250) }
      store("conv_i32_u") { loadA(); c.simd(251) }
      store("trunc_f64_s") { c.v128Const(f64x2(1e12, -3.7)); c.simd(252) }
      store("trunc_f64_u") { c.v128Const(f64x2(1e12, 3.7)); c.simd(253) }
      store("conv_low_s") { loadA(); c.simd(254) }
      store("conv_low_u") { loadA(); c.simd(255) }
      store("demote") { da(); c.simd(94) }
      store("promote") { fa(); c.simd(95) }
      // extending adds/muls, q15 rounding mul, dot, i64x2 compares,
      // load/store lane — the last MVP families
      store("extadd8s") { loadA(); c.simd(124) }
      store("extadd8u") { loadA(); c.simd(125) }
      store("extadd16s") { loadA(); c.simd(126) }
      store("q15mulr") { loadA(); loadB(); c.simd(130) }
      store("dot16") { loadA(); loadB(); c.simd(186) }
      store("extmul8ls") { loadA(); loadB(); c.simd(156) }
      store("extmul8hu") { loadA(); loadB(); c.simd(159) }
      store("extmul16ls") { loadA(); loadB(); c.simd(188) }
      store("extmul32hs") { loadA(); loadB(); c.simd(221) }
      store("eq64") { loadA(); loadB(); c.simd(214) }
      store("lt_s64") { loadA(); loadB(); c.simd(216) }
      store("ge_s64") { loadA(); loadB(); c.simd(219) }
      store("load16_lane") { // replace A's 16-bit lane 3 from mem[18]
        c.i32Const(18); loadA(); c.simdLaneMem(85, 3) }
      store("store_then_load") { // store32_lane writes B's lane 1 to mem[40]
        c.i32Const(40); loadB(); c.simdLaneMem(90, 1)
        c.i32Const(40); c.v128LoadShape(92) } // read it back zero-padded
      ()
    }
    m.exportFunc("run", run)
    val ti32 = m.funcType(Seq(), Seq(I32))
    val ti64 = m.funcType(Seq(), Seq(I64))
    def scalar(name: String, resultType: Int = I32)
              (body: WasmAsm.Code => Unit): Unit =
      m.exportFunc(name, m.func(
        if (resultType == I64) ti64 else ti32)(body))
    def ldB(c: WasmAsm.Code) = c.i32Const(16).v128Load()
    def ldA(c: WasmAsm.Code) = c.i32Const(0).v128Load()
    scalar("ex8s") { c => ldB(c); c.simdLane(21, 15); () }
    scalar("ex8u") { c => ldB(c); c.simdLane(22, 15); () }
    scalar("ex16s") { c => ldB(c); c.simdLane(24, 4); () }
    scalar("ex16u") { c => ldB(c); c.simdLane(25, 4); () }
    scalar("ex32") { c => ldB(c); c.simdLane(27, 2); () }
    scalar("ex64", I64) { c => ldB(c); c.simdLane(29, 1); () }
    scalar("anytrue") { c => ldA(c); c.simd(83); () }
    scalar("alltrue8") { c => ldA(c); c.simd(99); () }
    scalar("alltrue8b") { c => ldB(c); c.simd(99); () }
    scalar("alltrue16") { c => ldB(c); c.simd(131); () }
    scalar("alltrue32") { c => ldB(c); c.simd(163); () }
    scalar("alltrue64") { c => ldB(c); c.simd(195); () }
    scalar("bitmask8") { c => ldA(c); c.simd(100); () }
    scalar("bitmask16") { c => ldA(c); c.simd(132); () }
    scalar("bitmask32") { c => ldA(c); c.simd(164); () }
    scalar("bitmask64") { c => ldA(c); c.simd(196); () }
    // v128 through a LOCAL and a BLOCK RESULT: the box-table invariant
    // (one stack slot per v128, default-zero local replaced via set)
    m.exportFunc("via_local_block", m.func(ti32, locals = Seq(V128)) { c =>
      c.block(V128) { ldA(c); () }
      c.localSet(0)
      c.localGet(0); c.localGet(0); c.simd(110) // A + A (i8x16)
      c.simdLane(22, 9); ()                     // extract (0x90+0x90)&0xff
    })
    m.build()
  }

  private def newInstance(bytes: Array[Byte]): WasmInterp.Instance =
    new WasmInterp.Instance(WasmModule.decode(bytes))

  private def lanesOf(sz: Int, v: Array[Byte]): Seq[Long] =
    (0 until 16 / sz).map { j =>
      var out = 0L
      for (i <- 0 until sz) out |= (v(sz * j + i) & 0xffL) << (8 * i)
      val bits = 8 * sz
      if (bits == 64) out else (out << (64 - bits)) >> (64 - bits)
    }

  private def fromLanes(sz: Int, lanes: Seq[Long]): Array[Byte] = {
    val out = new Array[Byte](16)
    lanes.zipWithIndex.foreach { case (v, j) =>
      for (i <- 0 until sz) out(sz * j + i) = (v >>> (8 * i)).toByte
    }
    out
  }

  private def laneWise(sz: Int, x: Array[Byte], y: Array[Byte])
                      (f: (Long, Long) => Long): Array[Byte] =
    fromLanes(sz, lanesOf(sz, x).zip(lanesOf(sz, y)).map(f.tupled))

  test("simd: lane arithmetic, compares, bitwise, splats — hand-computed") {
    val inst = newInstance(buildModule())
    inst.invoke("run")
    def got(name: String): Array[Byte] = inst.readBytes(slots(name), 16)
    assert(got("roundtrip").sameElements(A))
    assert(got("const").sameElements(
      Array.tabulate(16)(i => (0x11 * (i % 8)).toByte)))
    assert(got("add8").sameElements(laneWise(1, A, B)(_ + _)))
    assert(got("sub8").sameElements(laneWise(1, A, B)(_ - _)))
    assert(got("mul16").sameElements(laneWise(2, A, B)(_ * _)))
    assert(got("add32").sameElements(laneWise(4, A, B)(_ + _)))
    assert(got("mul64").sameElements(laneWise(8, A, B)(_ * _)))
    assert(got("eq8").sameElements(
      laneWise(1, A, B)((a, b) => if (a == b) -1L else 0L)))
    assert(got("lt_s8").sameElements(
      laneWise(1, A, B)((a, b) => if (a < b) -1L else 0L)))
    assert(got("lt_u8").sameElements(
      laneWise(1, A, B)((a, b) => if ((a & 0xff) < (b & 0xff)) -1L else 0L)))
    assert(got("and").sameElements(A.zip(B).map { case (a, b) => (a & b).toByte }))
    assert(got("not").sameElements(A.map(a => (~a).toByte)))
    assert(got("bitselect").sameElements(
      Array.tabulate(16)(i => ((A(i) & C(i)) | (B(i) & ~C(i))).toByte)))
    assert(got("splat8").sameElements(Array.fill(16)(0xa5.toByte)))
    assert(got("splat32").sameElements(
      fromLanes(4, Seq.fill(4)(0x12345678L))))
    assert(got("shuffle").sameElements(A.reverse))
    assert(got("swizzle").sameElements(
      Array.tabulate(16)(i => if ((C(i) & 0xff) < 16) A(C(i) & 0xff) else 0: Byte)))
    // shift count is taken mod lane width: 11 % 8 == 3
    assert(got("shl8").sameElements(laneWise(1, A, A)((a, _) => a << 3)))
    assert(got("shr_s8").sameElements(laneWise(1, A, A)((a, _) => a >> 2)))
    assert(got("shr_u8").sameElements(
      laneWise(1, A, A)((a, _) => (a & 0xff) >>> 2)))
    assert(got("abs8").sameElements(
      fromLanes(1, lanesOf(1, A).map(math.abs))))
    assert(got("popcnt8").sameElements(
      A.map(a => java.lang.Integer.bitCount(a & 0xff).toByte)))
    val repl = A.clone(); repl(5) = 0x7c
    assert(got("repl8").sameElements(repl))
    // saturating / average / narrow / extend / load shapes
    assert(got("addsat_s8").sameElements(laneWise(1, A, B) { (a, b) =>
      math.max(-128L, math.min(127L, a + b)) }))
    assert(got("subsat_u8").sameElements(laneWise(1, A, B) { (a, b) =>
      math.max(0L, (a & 0xff) - (b & 0xff)) }))
    assert(got("avgr_u8").sameElements(laneWise(1, A, B) { (a, b) =>
      ((a & 0xff) + (b & 0xff) + 1) >> 1 }))
    assert(got("narrow8s").sameElements(fromLanes(1,
      (lanesOf(2, A) ++ lanesOf(2, B)).map(v =>
        math.max(-128L, math.min(127L, v))))))
    assert(got("extlo8s").sameElements(fromLanes(2,
      lanesOf(1, A).take(8))))
    assert(got("exthi8s").sameElements(fromLanes(2,
      lanesOf(1, A).drop(8))))
    assert(got("load8_splat").sameElements(Array.fill(16)(A(9))))
    assert(got("load32_zero").sameElements(
      fromLanes(4, Seq(lanesOf(4, A)(3) & 0xffffffffL, 0L, 0L, 0L))))
    assert(got("load8x8_s").sameElements(fromLanes(2,
      lanesOf(1, A).take(8))))
    // float lanes (exact bit compare through the byte image)
    assert(got("fadd").sameElements(f32x4(4.5f, -1.75f, -1.0f, 16.0f)))
    assert(got("fdiv").sameElements(f32x4(0.5f, -4.5f, -0.0f, -0.0f)))
    assert(got("fmin_zeros").sameElements(f32x4(0.0f, -2.25f, 0.0f, -0.0f)))
    assert(got("fnearest").sameElements(f32x4(2.0f, -2.0f, 2.0f, -2.0f)))
    assert(got("ftrunc").sameElements(f32x4(1.0f, -2.0f, 2.0f, -1.0f)))
    assert(got("fsplat").sameElements(f32x4(7.75f, 7.75f, 7.75f, 7.75f)))
    assert(got("fext_splat").sameElements(
      f32x4(-2.25f, -2.25f, -2.25f, -2.25f)))
    assert(got("feq").sameElements(fromLanes(4, Seq(0L, 0L, 0L, 0L))))
    assert(got("flt").sameElements(
      fromLanes(4, Seq(0xffffffffL, 0xffffffffL, 0L, 0xffffffffL))))
    assert(got("dadd").sameElements(f64x2(3.0, -4.25)))
    assert(got("dnearest").sameElements(f64x2(2.0, -0.0)))
    assert(got("drepl").sameElements(f64x2(11.0, -7.25)))
    // conversions
    assert(got("trunc_f32_s").sameElements(
      fromLanes(4, Seq(1L, -2L & 0xffffffffL, Int.MaxValue.toLong, 0L))))
    assert(got("trunc_f32_u").sameElements(
      fromLanes(4, Seq(1L, 0L, 3000000000L, 0L))))
    assert(got("conv_i32_s").sameElements(f32x4(
      lanesOf(4, A)(0).toFloat, lanesOf(4, A)(1).toFloat,
      lanesOf(4, A)(2).toFloat, lanesOf(4, A)(3).toFloat)))
    assert(got("trunc_f64_s").sameElements(
      fromLanes(4, Seq(Int.MaxValue.toLong, -3L & 0xffffffffL, 0L, 0L))))
    assert(got("demote").sameElements(f32x4(2.5f, -7.25f, 0.0f, 0.0f)))
    assert(got("promote").sameElements(f64x2(1.5, -2.25)))
    assert(got("fsqrt").sameElements(f32x4(math.sqrt(3.0).toFloat,
      math.sqrt(0.5).toFloat, 1.5f, 4.0f)))
    // the last MVP families
    assert(got("extadd8s").sameElements(fromLanes(2,
      lanesOf(1, A).grouped(2).map(_.sum).toSeq)))
    assert(got("extadd8u").sameElements(fromLanes(2,
      lanesOf(1, A).map(_ & 0xffL).grouped(2).map(_.sum).toSeq)))
    assert(got("q15mulr").sameElements(laneWise(2, A, B) { (a, b) =>
      val v = (a * b + (1L << 14)) >> 15
      math.max(-32768L, math.min(32767L, v)) }))
    assert(got("dot16").sameElements(fromLanes(4,
      lanesOf(2, A).zip(lanesOf(2, B)).map { case (a, b) => a * b }
        .grouped(2).map(_.sum).toSeq)))
    assert(got("extmul8ls").sameElements(fromLanes(2,
      lanesOf(1, A).take(8).zip(lanesOf(1, B).take(8))
        .map { case (a, b) => a * b })))
    assert(got("extmul8hu").sameElements(fromLanes(2,
      lanesOf(1, A).drop(8).zip(lanesOf(1, B).drop(8))
        .map { case (a, b) => (a & 0xff) * (b & 0xff) })))
    assert(got("eq64").sameElements(laneWise(8, A, B)((a, b) =>
      if (a == b) -1L else 0L)))
    assert(got("lt_s64").sameElements(laneWise(8, A, B)((a, b) =>
      if (a < b) -1L else 0L)))
    val l16 = A.clone()
    l16(6) = B(2); l16(7) = B(3) // 16-bit lane 3 replaced from mem[18]
    assert(got("load16_lane").sameElements(l16))
    assert(got("store_then_load").sameElements(
      fromLanes(4, Seq(lanesOf(4, B)(1) & 0xffffffffL, 0L, 0L, 0L))))
    // scalar surface
    assert(inst.invoke("ex8s")(0) == (B(15): Long)) // 0x7e
    assert(inst.invoke("ex8u")(0) == (B(15) & 0xffL))
    assert(inst.invoke("ex16s")(0) == lanesOf(2, B)(4))
    assert(inst.invoke("ex64")(0) == lanesOf(8, B)(1))
    assert(inst.invoke("anytrue")(0) == 1L)
    assert(inst.invoke("alltrue8")(0) == 0L) // A(0) == 0
    assert(inst.invoke("alltrue8b")(0) == 0L) // B(10) == 0
    val expectMask8 = lanesOf(1, A).zipWithIndex
      .filter(_._1 < 0).map(1L << _._2).sum
    assert(inst.invoke("bitmask8")(0) == expectMask8)
    // v128 through a local + block result
    assert(inst.invoke("via_local_block")(0) == ((0x90 + 0x90) & 0xff))
  }

  test("simd: out-of-range lane immediates are DECODE errors, not runtime crashes") {
    def tinyModule(body: WasmAsm.Code => Unit): Array[Byte] = {
      val m = new WasmAsm.ModuleBuilder
      m.memory(1, exportAs = Some("memory"))
      val t = m.funcType(Seq(), Seq())
      m.exportFunc("run", m.func(t)(body))
      m.build()
    }
    // shuffle selector >= 32
    val badShuffle = tinyModule { c =>
      c.v128Const(new Array[Byte](16)); c.v128Const(new Array[Byte](16))
      c.i8x16Shuffle(Array.tabulate(16)(i => if (i == 7) 40: Byte else 0: Byte))
      c.drop(); ()
    }
    val e1 = intercept[WasmModule.DecodeError](WasmModule.decode(badShuffle))
    assert(e1.getMessage.contains("shuffle lane 40"))
    // i8x16.extract_lane_u lane 16
    val badLane = tinyModule { c =>
      c.v128Const(new Array[Byte](16)); c.simdLane(22, 16); c.drop(); ()
    }
    val e2 = intercept[WasmModule.DecodeError](WasmModule.decode(badLane))
    assert(e2.getMessage.contains("lane 16 >= 16"))
    // v128.load16_lane lane 8
    val badMemLane = tinyModule { c =>
      c.i32Const(0); c.v128Const(new Array[Byte](16))
      c.simdLaneMem(85, 8); c.drop(); ()
    }
    val e3 = intercept[WasmModule.DecodeError](WasmModule.decode(badMemLane))
    assert(e3.getMessage.contains("lane 8 >= 8"))
  }

  test("simd: sqrt of a negative lane is an arithmetic NaN (payload-agnostic)") {
    val m = new WasmAsm.ModuleBuilder
    m.memory(1, exportAs = Some("memory"))
    val t = m.funcType(Seq(), Seq())
    val run = m.func(t) { c =>
      c.i32Const(0)
      c.v128Const(f32x4(-1.0f, 4.0f, -0.0f, 9.0f)); c.simd(227)
      c.v128Store(); ()
    }
    m.exportFunc("run", run)
    val inst = newInstance(m.build())
    inst.invoke("run")
    val bytes = inst.readBytes(0, 16)
    val lanes = (0 until 4).map { j =>
      java.lang.Float.intBitsToFloat(
        (0 until 4).map(i => (bytes(4 * j + i) & 0xff) << (8 * i)).sum)
    }
    assert(lanes(0).isNaN)        // payload impl-defined, NaN-ness is not
    assert(lanes(1) == 2.0f)
    assert(lanes(2) == 0.0f &&    // sqrt(-0.0) == -0.0 per IEEE 754
      java.lang.Float.floatToRawIntBits(lanes(2)) == Int.MinValue)
    assert(lanes(3) == 3.0f)
  }

  test("simd differential vs V8: identical memory image and scalar surface") {
    val node = new java.io.File("/usr/bin/node")
    assume(node.canExecute, "node not available on this machine")
    val bytes = buildModule()
    val wasmPath = Files.createTempFile("simd_diff", ".wasm")
    Files.write(wasmPath, bytes)
    val scalarNames = Seq("ex8s", "ex8u", "ex16s", "ex16u", "ex32",
      "anytrue", "alltrue8", "alltrue8b", "alltrue16", "alltrue32",
      "alltrue64", "bitmask8", "bitmask16", "bitmask32", "bitmask64",
      "via_local_block")
    val script =
      s"""const fs = require('fs');
         |const bytes = fs.readFileSync('$wasmPath');
         |(async () => {
         |  const { instance } = await WebAssembly.instantiate(bytes, {});
         |  const x = instance.exports;
         |  x.run();
         |  const mem = Buffer.from(x.memory.buffer, 0, ${slots.values.max + 16});
         |  const scalars = {};
         |  for (const n of ${scalarNames.map("\"" + _ + "\"").mkString("[", ",", "]")})
         |    scalars[n] = Number(x[n]());
         |  scalars['ex64'] = x.ex64().toString();
         |  console.log(JSON.stringify({mem: mem.toString('base64'), scalars}));
         |})();
         |""".stripMargin
    val js = Files.createTempFile("simd_v8", ".js")
    Files.writeString(js, script)
    val proc = new ProcessBuilder("/usr/bin/node", js.toString).start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).trim
    assert(proc.waitFor() == 0,
      new String(proc.getErrorStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
    val v8 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    val v8mem = java.util.Base64.getDecoder.decode(v8.get("mem").asText)

    val inst = newInstance(bytes)
    inst.invoke("run")
    val ourMem = inst.readBytes(0, v8mem.length)
    // compare slot by slot for a readable failure
    slots.foreach { case (name, addr) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(ourMem, addr, addr + 16),
        java.util.Arrays.copyOfRange(v8mem, addr, addr + 16)),
        s"slot '$name' diverges from V8")
    }
    assert(java.util.Arrays.equals(ourMem, v8mem))
    scalarNames.foreach { n =>
      assert(inst.invoke(n)(0) == v8.at(s"/scalars/$n").asLong, n)
    }
    assert(inst.invoke("ex64")(0).toString == v8.at("/scalars/ex64").asText)
  }
}
