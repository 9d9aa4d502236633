package graft.wasm

import WasmModule.{I32, I64}

/** Hand-assembled guest modules for the `wasm` processor gates/specs
  * (the container has no wasm toolchain — see [[WasmAsm]]). These are
  * real spec-conformant binaries exercising the full host contract:
  * imports, a guest bump allocator with `memory.grow`, loops, branches,
  * byte loads/stores, i64 packing, and the `benthos_wasm` v0 API.
  */
object DemoModules {

  /** Go-style module (exports `malloc`/`free`): ASCII-uppercases the
    * message content in place and sets metadata `wasm_len` to the
    * decimal byte length. The heap pointer resets per `process` call —
    * per-message allocation lifecycle, so memory use is bounded by the
    * largest single message, not the partition size.
    */
  def upperLen(): Array[Byte] = {
    val m = new WasmAsm.ModuleBuilder
    val tAsBytes = m.funcType(Nil, Seq(I64))
    val tSetBytes = m.funcType(Seq(I32, I32), Nil)
    val tGetMeta = m.funcType(Seq(I32, I32), Seq(I64))
    val tSetMeta = m.funcType(Seq(I32, I32, I32, I32), Nil)
    val tMalloc = m.funcType(Seq(I32), Seq(I32))
    val tFree = m.funcType(Seq(I32), Nil)
    val tVoid = m.funcType(Nil, Nil)
    val tItoa = m.funcType(Seq(I32, I32), Seq(I32))

    val fAsBytes = m.importFunc("benthos_wasm", "v0_msg_as_bytes", tAsBytes)
    val fSetBytes = m.importFunc("benthos_wasm", "v0_msg_set_bytes", tSetBytes)
    m.importFunc("benthos_wasm", "v0_msg_get_meta", tGetMeta)
    val fSetMeta = m.importFunc("benthos_wasm", "v0_msg_set_meta", tSetMeta)

    m.memory(min = 1, max = Some(16))
    val gHeap = m.global(I32, mutable = true)(_.i32Const(4096))
    val key = "wasm_len".getBytes("UTF-8")
    val keyOff = 16
    m.data(keyOff, key)

    // malloc(size) -> ptr: bump; grows memory a page at a time if the
    // new heap top exceeds the current size (traps if limits exceeded)
    val fMalloc = m.func(tMalloc, locals = Seq(I32)) { c =>
      c.globalGet(gHeap).localSet(1)                 // ptr = heap
      c.localGet(1).localGet(0).i32Const(7).i32Add()
        .i32Const(-8).i32And().i32Add()
        .globalSet(gHeap)                            // heap = ptr + align8(size)
      c.block() {
        c.loop() {
          c.globalGet(gHeap)
            .memorySize().i32Const(16).i32Shl()
            .i32LeS()
          c.brIf(1)                                  // heap fits: done
          c.i32Const(1).memoryGrow()
          c.i32Const(-1).i32Eq()
          c.ifThen()(c.unreachable())                // grow failed: trap
          c.br(0)
        }
      }
      c.localGet(1)
    }
    val fFree = m.func(tFree)(_ => ()) // bump allocator: free is a no-op

    // itoa(n, bufEnd) -> len; digits land at [bufEnd-len, bufEnd)
    val fItoa = m.func(tItoa, locals = Seq(I32)) { c =>
      c.i32Const(0).localSet(2)
      c.loop() {
        c.localGet(1).i32Const(1).i32Sub().localSet(1)  // bufEnd -= 1
        c.localGet(1)
        c.localGet(0).i32Const(10).i32RemU().i32Const(48).i32Add()
        c.i32Store8()                                   // *bufEnd = '0' + n%10
        c.localGet(0).i32Const(10).i32DivU().localSet(0)
        c.localGet(2).i32Const(1).i32Add().localSet(2)  // len += 1
        c.localGet(0).i32Const(0).i32Ne()
        c.brIf(0)
      }
      c.localGet(2)
    }

    // process(): uppercase [a-z] in place; set wasm_len metadata
    // locals: 0=pl(i64) 1=ptr 2=len 3=i 4=c 5=vend 6=vlen
    val fProcess = m.func(tVoid, locals = Seq(I64, I32, I32, I32, I32, I32, I32)) { c =>
      c.i32Const(4096).globalSet(gHeap)                 // per-message heap reset
      c.call(fAsBytes).localSet(0)
      c.localGet(0).i64Const(32).i64ShrU().i32WrapI64().localSet(1)
      c.localGet(0).i64Const(0xffffffffL).i64And().i32WrapI64().localSet(2)
      c.i32Const(0).localSet(3)
      c.block() {
        c.loop() {
          c.localGet(3).localGet(2).i32GeU()
          c.brIf(1)
          c.localGet(1).localGet(3).i32Add().i32Load8U().localSet(4)
          c.localGet(4).i32Const(97).i32GeU()
          c.localGet(4).i32Const(122).i32LeS()
          c.i32And()
          c.ifThen() {
            c.localGet(1).localGet(3).i32Add()
            c.localGet(4).i32Const(32).i32Sub()
            c.i32Store8()
          }
          c.localGet(3).i32Const(1).i32Add().localSet(3)
          c.br(0)
        }
      }
      c.localGet(1).localGet(2).call(fSetBytes)
      // value buffer for the decimal length
      c.i32Const(16).call(fMalloc).i32Const(16).i32Add().localSet(5)
      c.localGet(2).localGet(5).call(fItoa).localSet(6)
      c.i32Const(keyOff).i32Const(key.length)
      c.localGet(5).localGet(6).i32Sub()
      c.localGet(6)
      c.call(fSetMeta)
    }

    m.exportFunc("malloc", fMalloc)
    m.exportFunc("free", fFree)
    m.exportFunc("itoa", fItoa)
    m.exportFunc("process", fProcess)
    m.build()
  }
}
