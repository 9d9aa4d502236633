package graft.wasm

import org.scalatest.funsuite.AnyFunSuite

import WasmModule.{I32, I64, F64}
import WasmInterp.{Instance, Trap}

/** The graft.wasm engine: binary decode → interpret, core-spec
  * semantics (control flow, integer/float arithmetic, memory, tables,
  * traps), plus the assembled demo module's guest-side behaviors.
  */
class WasmSpec extends AnyFunSuite {

  private def instance(build: WasmAsm.ModuleBuilder => Unit,
                       host: Map[(String, String), WasmInterp.HostFn] = Map.empty)
      : Instance = {
    val m = new WasmAsm.ModuleBuilder
    build(m)
    new Instance(WasmModule.decode(m.build()), host)
  }

  test("add: params, i32.add, result") {
    val inst = instance { m =>
      val t = m.funcType(Seq(I32, I32), Seq(I32))
      val f = m.func(t)(c => c.localGet(0).localGet(1).i32Add())
      m.exportFunc("add", f)
    }
    assert(inst.invoke("add", 2L, 40L)(0) == 42L)
    assert(inst.invoke("add", -1L, 1L)(0) == 0L)
  }

  test("factorial via loop: block/loop/br_if, locals, i64 mul") {
    val inst = instance { m =>
      val t = m.funcType(Seq(I64), Seq(I64))
      val f = m.func(t, locals = Seq(I64)) { c =>
        c.i64Const(1L).localSet(1)
        c.block() {
          c.loop() {
            c.localGet(0).i64Const(1L).op(0x53) // i64.lt_s
            c.brIf(1)
            c.localGet(1).localGet(0).i64Mul().localSet(1)
            c.localGet(0).i64Const(1L).op(0x7d).localSet(0) // i64.sub
            c.br(0)
          }
        }
        c.localGet(1)
      }
      m.exportFunc("fact", f)
    }
    assert(inst.invoke("fact", 5L)(0) == 120L)
    assert(inst.invoke("fact", 20L)(0) == 2432902008176640000L)
    assert(inst.invoke("fact", 0L)(0) == 1L)
  }

  test("recursive fib: call, if/else with results") {
    val inst = instance { m =>
      val t = m.funcType(Seq(I32), Seq(I32))
      // func 0: fib(n) = n < 2 ? n : fib(n-1) + fib(n-2)
      val f = m.func(t) { c =>
        c.localGet(0).i32Const(2).i32LtS()
        c.ifThenElse(I32)(c.localGet(0)) {
          c.localGet(0).i32Const(1).i32Sub().call(0)
          c.localGet(0).i32Const(2).i32Sub().call(0)
          c.i32Add()
        }
      }
      m.exportFunc("fib", f)
    }
    assert(inst.invoke("fib", 10L)(0) == 55L)
    assert(inst.invoke("fib", 20L)(0) == 6765L)
  }

  test("call_indirect dispatches through the table; type mismatch traps") {
    val inst = instance { m =>
      val t = m.funcType(Seq(I32, I32), Seq(I32))
      val tOther = m.funcType(Seq(I32), Seq(I32))
      val fAdd = m.func(t)(c => c.localGet(0).localGet(1).i32Add())
      val fMul = m.func(t)(c => c.localGet(0).localGet(1).i32Mul())
      val fNeg = m.func(tOther)(c => c.i32Const(0).localGet(0).i32Sub())
      m.table(3)
      m.elem(0, Seq(fAdd, fMul, fNeg))
      val tDispatch = m.funcType(Seq(I32, I32, I32), Seq(I32))
      val fDisp = m.func(tDispatch) { c =>
        c.localGet(1).localGet(2).localGet(0).callIndirect(t)
      }
      m.exportFunc("dispatch", fDisp)
    }
    assert(inst.invoke("dispatch", 0L, 6L, 7L)(0) == 13L)
    assert(inst.invoke("dispatch", 1L, 6L, 7L)(0) == 42L)
    val e = intercept[Trap](inst.invoke("dispatch", 2L, 6L, 7L))
    assert(e.getMessage.contains("type mismatch"))
    val e2 = intercept[Trap](inst.invoke("dispatch", 9L, 6L, 7L))
    assert(e2.getMessage.contains("undefined table element"))
  }

  test("br_table selects the right depth") {
    // returns 10/20/30 for cases 0/1, 2, default
    val inst = instance { m =>
      val t = m.funcType(Seq(I32), Seq(I32))
      val f = m.func(t, locals = Seq(I32)) { c =>
        c.block() {
          c.block() {
            c.block() {
              c.localGet(0)
              c.brTable(Seq(0, 0, 1), 2)
            }
            c.i32Const(10).localSet(1); c.br(1)
          }
          c.i32Const(20).localSet(1); c.br(0)
        }
        c.localGet(1)
        c.localGet(1).i32Eqz()
        c.ifThen()(c.i32Const(30).localSet(1))
        c.drop()
        c.localGet(1)
      }
      m.exportFunc("sel", f)
    }
    assert(inst.invoke("sel", 0L)(0) == 10L)
    assert(inst.invoke("sel", 1L)(0) == 10L)
    assert(inst.invoke("sel", 2L)(0) == 20L)
    assert(inst.invoke("sel", 7L)(0) == 30L)
  }

  test("memory: data segment, loads/stores, size/grow, OOB traps") {
    val inst = instance { m =>
      m.memory(1, Some(3))
      m.data(8, Array[Byte](1, 2, 3, 4))
      val t = m.funcType(Seq(I32), Seq(I32))
      val fLoad = m.func(t)(c => c.localGet(0).i32Load())
      m.exportFunc("load", fLoad)
      val t2 = m.funcType(Seq(I32, I32), Nil)
      val fStore = m.func(t2)(c => c.localGet(0).localGet(1).i32Store())
      m.exportFunc("store", fStore)
      val t3 = m.funcType(Nil, Seq(I32))
      m.exportFunc("grow", m.func(t3)(c => c.i32Const(1).memoryGrow()))
      m.exportFunc("size", m.func(t3)(c => c.memorySize()))
    }
    assert(inst.invoke("load", 8L)(0) == 0x04030201L) // little-endian
    inst.invoke("store", 100L, -559038737L)
    assert(inst.invoke("load", 100L)(0) == -559038737L)
    assert(inst.invoke("size")(0) == 1L)
    assert(inst.invoke("grow")(0) == 1L)   // old size
    assert(inst.invoke("size")(0) == 2L)
    inst.invoke("store", 70000L, 7L)        // now in-bounds after grow
    assert(inst.invoke("load", 70000L)(0) == 7L)
    assert(inst.invoke("grow")(0) == 2L)
    assert(inst.invoke("grow")(0) == -1L)   // beyond max=3: grow fails
    intercept[Trap](inst.invoke("load", 300000L))
  }

  test("integer traps: div by zero, overflow, trunc of NaN") {
    val inst = instance { m =>
      val t = m.funcType(Seq(I32, I32), Seq(I32))
      m.exportFunc("div", m.func(t)(c => c.localGet(0).localGet(1).op(0x6d)))
      val tf = m.funcType(Seq(F64), Seq(I32))
      m.exportFunc("trunc", m.func(tf)(c => c.localGet(0).op(0xaa)))
      m.exportFunc("truncSat", m.func(tf) { c =>
        c.localGet(0).op(0xfc); c.op(0x02) // raw 0xFC 0x02 via two bytes
      })
    }
    assert(inst.invoke("div", 7L, -2L)(0) == -3L)
    intercept[Trap](inst.invoke("div", 7L, 0L))
    intercept[Trap](inst.invoke("div", Int.MinValue.toLong, -1L))
    val nan = java.lang.Double.doubleToRawLongBits(Double.NaN)
    intercept[Trap](inst.invoke("trunc", nan))
    assert(inst.invoke("truncSat", nan)(0) == 0L)
    val big = java.lang.Double.doubleToRawLongBits(1e20)
    assert(inst.invoke("truncSat", big)(0) == Int.MaxValue.toLong)
  }

  test("floats: f64 arithmetic, sqrt, conversions round-trip") {
    val inst = instance { m =>
      val t = m.funcType(Seq(F64, F64), Seq(F64))
      m.exportFunc("hyp", m.func(t) { c =>
        c.localGet(0).localGet(0).op(0xa2) // f64.mul
        c.localGet(1).localGet(1).op(0xa2)
        c.op(0xa0)                         // f64.add
        c.op(0x9f)                         // f64.sqrt
      })
      val ti = m.funcType(Seq(I32), Seq(F64))
      m.exportFunc("toF", m.func(ti)(c => c.localGet(0).op(0xb7)))
    }
    val r = java.lang.Double.longBitsToDouble(
      inst.invoke("hyp",
        java.lang.Double.doubleToRawLongBits(3.0),
        java.lang.Double.doubleToRawLongBits(4.0))(0))
    assert(r == 5.0)
    assert(java.lang.Double.longBitsToDouble(inst.invoke("toF", -7L)(0)) == -7.0)
  }

  test("host imports: calls out and back with values") {
    var seen = List.empty[Long]
    val inst = instance(m => {
      val tHost = m.funcType(Seq(I32), Seq(I32))
      val h = m.importFunc("env", "double", tHost)
      val t = m.funcType(Seq(I32), Seq(I32))
      val f = m.func(t)(c => c.localGet(0).call(h).i32Const(1).i32Add())
      m.exportFunc("run", f)
    }, host = Map(("env", "double") -> { args =>
      seen ::= args(0); Array(args(0) * 2)
    }))
    assert(inst.invoke("run", 21L)(0) == 43L)
    assert(seen == List(21L))
  }

  test("demo module: malloc is 8-aligned and monotonic; itoa renders decimals") {
    val inst = new Instance(WasmModule.decode(DemoModules.upperLen()),
      hostFns = stubHost())
    val p1 = inst.invoke("malloc", 5L)(0)
    val p2 = inst.invoke("malloc", 3L)(0)
    assert(p1 % 8 == 0 && p2 == p1 + 8)
    // itoa(1234, bufEnd) writes "1234" ending at bufEnd
    val bufEnd = 600L
    val len = inst.invoke("itoa", 1234L, bufEnd)(0)
    assert(len == 4L)
    assert(new String(inst.readBytes(596, 4), "UTF-8") == "1234")
    assert(inst.invoke("itoa", 0L, 700L)(0) == 1L)
    assert(new String(inst.readBytes(699, 1), "UTF-8") == "0")
  }

  test("unimplemented proposals are rejected BY NAME at decode (r15)") {
    // each binary is structurally valid up to the offending opcode, so
    // the named rejection — not a framing error — must fire
    def bodyWith(emit: WasmAsm.Code => Unit): Array[Byte] = {
      val m = new WasmAsm.ModuleBuilder
      val t = m.funcType(Seq(I32), Seq(I32))
      val f = m.func(t) { c => c.localGet(0); emit(c) }
      m.exportFunc("f", f)
      m.build()
    }
    val tailCall = intercept[WasmModule.DecodeError](
      WasmModule.decode(bodyWith(_.op(0x12))))
    assert(tailCall.getMessage.contains("tail-call proposal"))
    val callRef = intercept[WasmModule.DecodeError](
      WasmModule.decode(bodyWith(_.op(0x14))))
    assert(callRef.getMessage.contains("typed function references"))
    val eh = intercept[WasmModule.DecodeError](
      WasmModule.decode(bodyWith(_.op(0x06))))
    assert(eh.getMessage.contains("exception-handling proposal"))
    val threads = intercept[WasmModule.DecodeError](
      WasmModule.decode(bodyWith(_.op(0xfe))))
    assert(threads.getMessage.contains("threads proposal"))
    // GC / function-references VALUE TYPES reject in the type section
    def typeWith(vt: Int): Array[Byte] = {
      val m = new WasmAsm.ModuleBuilder
      val t = m.funcType(Seq(vt), Seq(I32))
      val f = m.func(t)(c => c.i32Const(0))
      m.exportFunc("f", f)
      m.build()
    }
    val gc = intercept[WasmModule.DecodeError](
      WasmModule.decode(typeWith(0x6b))) // structref
    assert(gc.getMessage.contains("GC proposal"))
    val refNull = intercept[WasmModule.DecodeError](
      WasmModule.decode(typeWith(0x63))) // (ref null ht)
    assert(refNull.getMessage.contains("typed function references"))
  }

  test("v128-signature exports are rejected at the host invoke boundary (ADVICE r14)") {
    val inst = instance { m =>
      val tv = m.funcType(Seq(WasmModule.V128), Seq(WasmModule.V128))
      val f = m.func(tv)(c => c.localGet(0))
      m.exportFunc("vec_id", f)
      val ti = m.funcType(Seq(I32), Seq(I32))
      val g = m.func(ti)(c => c.localGet(0))
      m.exportFunc("ok", g)
    }
    val e = intercept[WasmInterp.LinkError](inst.invoke("vec_id", 1L))
    assert(e.getMessage.contains("v128"))
    assert(inst.invoke("ok", 7L)(0) == 7L) // scalar exports unaffected
  }

  private def stubHost(): Map[(String, String), WasmInterp.HostFn] = Map(
    ("benthos_wasm", "v0_msg_as_bytes") -> (_ => Array(0L)),
    ("benthos_wasm", "v0_msg_set_bytes") -> (_ => Array.empty),
    ("benthos_wasm", "v0_msg_get_meta") -> (_ => Array(0L)),
    ("benthos_wasm", "v0_msg_set_meta") -> (_ => Array.empty))
}
