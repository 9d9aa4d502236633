package graft.wasm

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import WasmModule.{I32, I64}

/** Differential fuzzing for the wasm interpreter: random arithmetic /
  * comparison / conversion expression trees are ASSEMBLED into real
  * module binaries (WasmAsm), decoded and executed by WasmInterp, and
  * checked against an independent Scala evaluator implementing the
  * same core-spec semantics (shift masking, unsigned division,
  * two's-complement wrap, NaN-free integer paths). The two
  * implementations share no code: the evaluator works on the tree, the
  * interpreter on the wire bytes — a mismatch means either the
  * assembler, the decoder, or the evaluator loop is wrong.
  */
class WasmDifferentialSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  // ── expression tree ────────────────────────────────────────────────
  sealed trait E
  final case class C32(v: Int) extends E
  final case class C64(v: Long) extends E
  final case class P32() extends E // param 0: i32
  final case class P64() extends E // param 1: i64
  final case class Un(op: String, a: E) extends E
  final case class Bin(op: String, a: E, b: E) extends E
  final case class Sel(c: E, t: E, f: E) extends E // select on i32 cond

  /** The type an expression produces: true = i64, false = i32. */
  private def is64(e: E): Boolean = e match {
    case C64(_) | P64() => true
    case C32(_) | P32() => false
    case Un(op, _) => op == "extend_s" || op == "extend_u" || op.startsWith("i64_")
    case Bin(op, a, _) => !op.startsWith("cmp") && is64(a)
    case Sel(_, t, _) => is64(t)
  }

  private val un32 = Seq("clz", "ctz", "popcnt", "eqz")
  private val un64 = Seq("i64_clz", "i64_ctz", "i64_popcnt")
  private val binOps = Seq("add", "sub", "mul", "and", "or", "xor",
    "shl", "shr_s", "shr_u", "rotl", "rotr", "div_s", "div_u",
    "rem_s", "rem_u")
  private val cmpOps = Seq("cmp_eq", "cmp_lt_s", "cmp_lt_u", "cmp_gt_s",
    "cmp_le_u", "cmp_ge_s")

  private def genExpr(depth: Int, want64: Boolean): Gen[E] =
    if (depth == 0) {
      if (want64) Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue).map(C64.apply), Gen.const(P64()))
      else Gen.oneOf(Gen.chooseNum(Int.MinValue, Int.MaxValue).map(C32.apply), Gen.const(P32()))
    } else Gen.frequency(
      2 -> genExpr(0, want64),
      (if (want64) 0 else 2) -> (for {
        op <- Gen.oneOf(un32)
        a <- genExpr(depth - 1, want64 = false)
      } yield Un(op, a)),
      (if (want64) 2 else 0) -> (for {
        op <- Gen.oneOf(un64)
        a <- genExpr(depth - 1, want64 = true)
      } yield Un(op, a)),
      (if (want64) 2 else 0) -> genExpr(depth - 1, want64 = false)
        .flatMap(a => Gen.oneOf("extend_s", "extend_u").map(Un(_, a))),
      (if (want64) 0 else 1) -> genExpr(depth - 1, want64 = true)
        .map(Un("wrap", _)),
      (if (want64) 0 else 2) -> (for { // comparisons are i32 results
        op <- Gen.oneOf(cmpOps)
        o64 <- Gen.oneOf(true, false)
        a <- genExpr(depth - 1, o64)
        b <- genExpr(depth - 1, o64)
      } yield Bin(op, a, b)),
      5 -> (for {
        op <- Gen.oneOf(binOps)
        a <- genExpr(depth - 1, want64)
        b <- genExpr(depth - 1, want64)
      } yield Bin(op, a, b)),
      2 -> (for {
        c <- genExpr(depth - 1, want64 = false)
        t <- genExpr(depth - 1, want64)
        f <- genExpr(depth - 1, want64)
      } yield Sel(c, t, f)))

  // ── independent reference evaluator ───────────────────────────────
  private case object TrapRef extends RuntimeException("ref trap")
  private def evalRef(e: E, p32: Int, p64: Long): Long = e match {
    case C32(v) => v.toLong
    case C64(v) => v
    case P32() => p32.toLong
    case P64() => p64
    case Un(op, a) =>
      val x = evalRef(a, p32, p64)
      op match {
        case "clz" => Integer.numberOfLeadingZeros(x.toInt).toLong
        case "ctz" => Integer.numberOfTrailingZeros(x.toInt).toLong
        case "popcnt" => Integer.bitCount(x.toInt).toLong
        case "eqz" => if (x.toInt == 0) 1L else 0L
        case "i64_clz" => java.lang.Long.numberOfLeadingZeros(x).toLong
        case "i64_ctz" => java.lang.Long.numberOfTrailingZeros(x).toLong
        case "i64_popcnt" => java.lang.Long.bitCount(x).toLong
        case "extend_s" => x.toInt.toLong
        case "extend_u" => x & 0xffffffffL
        case "wrap" => x.toInt.toLong
      }
    case Bin(op, a, b) =>
      val w64 = is64(a)
      val x = evalRef(a, p32, p64); val y = evalRef(b, p32, p64)
      if (op.startsWith("cmp")) {
        val r = op match {
          case "cmp_eq" => x == y
          case "cmp_lt_s" => if (w64) x < y else x.toInt < y.toInt
          case "cmp_lt_u" =>
            if (w64) java.lang.Long.compareUnsigned(x, y) < 0
            else Integer.compareUnsigned(x.toInt, y.toInt) < 0
          case "cmp_gt_s" => if (w64) x > y else x.toInt > y.toInt
          case "cmp_le_u" =>
            if (w64) java.lang.Long.compareUnsigned(x, y) <= 0
            else Integer.compareUnsigned(x.toInt, y.toInt) <= 0
          case "cmp_ge_s" => if (w64) x >= y else x.toInt >= y.toInt
        }
        if (r) 1L else 0L
      } else if (w64) op match {
        case "add" => x + y
        case "sub" => x - y
        case "mul" => x * y
        case "and" => x & y
        case "or" => x | y
        case "xor" => x ^ y
        case "shl" => x << (y & 63)
        case "shr_s" => x >> (y & 63)
        case "shr_u" => x >>> (y & 63)
        case "rotl" => java.lang.Long.rotateLeft(x, (y & 63).toInt)
        case "rotr" => java.lang.Long.rotateRight(x, (y & 63).toInt)
        case "div_s" =>
          if (y == 0 || (x == Long.MinValue && y == -1L)) throw TrapRef
          else x / y
        case "div_u" =>
          if (y == 0) throw TrapRef else java.lang.Long.divideUnsigned(x, y)
        case "rem_s" =>
          if (y == 0) throw TrapRef
          else if (x == Long.MinValue && y == -1L) 0L else x % y
        case "rem_u" =>
          if (y == 0) throw TrapRef else java.lang.Long.remainderUnsigned(x, y)
      } else {
        val xi = x.toInt; val yi = y.toInt
        val r: Int = op match {
          case "add" => xi + yi
          case "sub" => xi - yi
          case "mul" => xi * yi
          case "and" => xi & yi
          case "or" => xi | yi
          case "xor" => xi ^ yi
          case "shl" => xi << (yi & 31)
          case "shr_s" => xi >> (yi & 31)
          case "shr_u" => xi >>> (yi & 31)
          case "rotl" => Integer.rotateLeft(xi, yi)
          case "rotr" => Integer.rotateRight(xi, yi)
          case "div_s" =>
            if (yi == 0 || (xi == Int.MinValue && yi == -1)) throw TrapRef
            else xi / yi
          case "div_u" =>
            if (yi == 0) throw TrapRef else Integer.divideUnsigned(xi, yi)
          case "rem_s" =>
            if (yi == 0) throw TrapRef
            else if (xi == Int.MinValue && yi == -1) 0 else xi % yi
          case "rem_u" =>
            if (yi == 0) throw TrapRef else Integer.remainderUnsigned(xi, yi)
        }
        r.toLong
      }
    case Sel(c, t, f) =>
      // wasm select evaluates ALL THREE operands (no short-circuit)
      val tv = evalRef(t, p32, p64)
      val fv = evalRef(f, p32, p64)
      val cv = evalRef(c, p32, p64)
      if (cv.toInt != 0) tv else fv
  }

  // ── assembler emission ─────────────────────────────────────────────
  private def emit(c: WasmAsm.Code, e: E): Unit = e match {
    case C32(v) => c.i32Const(v); ()
    case C64(v) => c.i64Const(v); ()
    case P32() => c.localGet(0); ()
    case P64() => c.localGet(1); ()
    case Un(op, a) =>
      emit(c, a)
      val code = op match {
        case "clz" => 0x67
        case "ctz" => 0x68
        case "popcnt" => 0x69
        case "eqz" => 0x45
        case "i64_clz" => 0x79
        case "i64_ctz" => 0x7a
        case "i64_popcnt" => 0x7b
        case "extend_s" => 0xac
        case "extend_u" => 0xad
        case "wrap" => 0xa7
      }
      c.op(code); ()
    case Bin(op, a, b) =>
      val w64 = is64(a)
      emit(c, a); emit(c, b)
      val code = (op, w64) match {
        case ("add", false) => 0x6a
        case ("sub", false) => 0x6b
        case ("mul", false) => 0x6c
        case ("div_s", false) => 0x6d
        case ("div_u", false) => 0x6e
        case ("rem_s", false) => 0x6f
        case ("rem_u", false) => 0x70
        case ("and", false) => 0x71
        case ("or", false) => 0x72
        case ("xor", false) => 0x73
        case ("shl", false) => 0x74
        case ("shr_s", false) => 0x75
        case ("shr_u", false) => 0x76
        case ("rotl", false) => 0x77
        case ("rotr", false) => 0x78
        case ("add", true) => 0x7c
        case ("sub", true) => 0x7d
        case ("mul", true) => 0x7e
        case ("div_s", true) => 0x7f
        case ("div_u", true) => 0x80
        case ("rem_s", true) => 0x81
        case ("rem_u", true) => 0x82
        case ("and", true) => 0x83
        case ("or", true) => 0x84
        case ("xor", true) => 0x85
        case ("shl", true) => 0x86
        case ("shr_s", true) => 0x87
        case ("shr_u", true) => 0x88
        case ("rotl", true) => 0x89
        case ("rotr", true) => 0x8a
        case ("cmp_eq", false) => 0x46
        case ("cmp_lt_s", false) => 0x48
        case ("cmp_lt_u", false) => 0x49
        case ("cmp_gt_s", false) => 0x4a
        case ("cmp_le_u", false) => 0x4d
        case ("cmp_ge_s", false) => 0x4e
        case ("cmp_eq", true) => 0x51
        case ("cmp_lt_s", true) => 0x53
        case ("cmp_lt_u", true) => 0x54
        case ("cmp_gt_s", true) => 0x55
        case ("cmp_le_u", true) => 0x58
        case ("cmp_ge_s", true) => 0x59
      }
      c.op(code); ()
    case Sel(cc, t, f) =>
      emit(c, t); emit(c, f); emit(c, cc)
      c.select(); ()
  }

  private def run(e: E, p32: Int, p64: Long): Long = {
    val m = new WasmAsm.ModuleBuilder
    val rt = if (is64(e)) I64 else I32
    val t = m.funcType(Seq(I32, I64), Seq(rt))
    val f = m.func(t)(c => { emit(c, e); () })
    m.exportFunc("f", f)
    val inst = new WasmInterp.Instance(WasmModule.decode(m.build()))
    val out = inst.invoke("f", p32.toLong, p64)(0)
    if (is64(e)) out else out.toInt.toLong
  }

  private val caseGen: Gen[(E, Int, Long)] = for {
    want64 <- Gen.oneOf(true, false)
    // generator construction is eager and exponential in depth — 4 is
    // ~14k Gen objects per sample, deep enough to nest every op family
    depth <- Gen.choose(1, 4)
    e <- genExpr(depth, want64)
    p32 <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    p64 <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield (e, p32, p64)

  test("random expression trees: interpreter == reference evaluator") {
    (0 until 500).foreach { i =>
      val (e, p32, p64) = sample(caseGen, i.toLong)
      val ref =
        try Right(evalRef(e, p32, p64))
        catch { case TrapRef => Left("trap") }
      val got =
        try Right(run(e, p32, p64))
        catch { case _: WasmInterp.Trap => Left("trap") }
      assert(got == ref, s"seed $i expr $e p32=$p32 p64=$p64")
    }
  }

  test("known edge cases: MinValue division, shift masking, rotates") {
    val cases: Seq[(E, Int, Long)] = Seq(
      (Bin("div_s", C32(Int.MinValue), C32(-1)), 0, 0L), // trap
      (Bin("rem_s", C32(Int.MinValue), C32(-1)), 0, 0L), // 0, NOT trap
      (Bin("div_s", C64(Long.MinValue), C64(-1L)), 0, 0L), // trap
      (Bin("shl", C32(1), C32(33)), 0, 0L),   // masked: 1 << 1
      (Bin("shr_u", C32(-1), C32(32)), 0, 0L), // masked: no-op
      (Bin("rotl", C64(0x8000000000000001L), C64(1)), 0, 0L),
      (Bin("div_u", C32(-2), C32(3)), 0, 0L),
      (Un("extend_u", C32(-1)), 0, 0L),
      (Un("wrap", C64(0x1_0000_0001L)), 0, 0L))
    cases.foreach { case (e, a, b) =>
      val ref = try Right(evalRef(e, a, b)) catch { case TrapRef => Left("trap") }
      val got = try Right(run(e, a, b)) catch { case _: WasmInterp.Trap => Left("trap") }
      assert(got == ref, s"edge $e")
    }
  }
}
