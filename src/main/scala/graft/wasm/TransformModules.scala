package graft.wasm

import WasmModule.I32

/** Hand-assembled guest modules for the `redpanda_data_transform`
  * processor (see [[WasmAsm]] — no wasm toolchain in the container).
  * Both speak the real transform guest ABI: poll `read_batch_header`,
  * drain records with `read_next_record`, parse the zigzag-varint
  * record serde IN GUEST CODE, and emit via `write_record` /
  * `write_record_with_options`. The poll loop exits when the host
  * returns -1, so `_start` returns once per staged chunk and is
  * re-entered for the next (module state persists).
  */
object TransformModules {

  private final val AttrsPtr = 8
  private final val TsPtr = 16
  private final val OffPtr = 24
  private final val OptsPtr = 48
  private final val BufPtr = 64

  /** Common scaffolding: imports, memory, the varint reader, and the
    * `_start` batch/record loop; `perRecord` emits the record tail
    * given (fVarint, gPos, fWrite, fWriteOpts) with locals
    * 0=maxSize 1=count 2=i 3=n 4=k 5=vlen 6=a 7=b 8=tmp.
    */
  private def build(perRecord: (WasmAsm.ModuleBuilder, WasmAsm.Code,
                                Int, Int, Int, Int) => Unit,
                    extraData: Seq[(Int, Array[Byte])] = Nil): Array[Byte] = {
    val m = new WasmAsm.ModuleBuilder
    val tVoid = m.funcType(Nil, Nil)
    val tBatchHeader = m.funcType(Seq.fill(10)(I32), Seq(I32))
    val tNextRecord = m.funcType(Seq.fill(5)(I32), Seq(I32))
    val tWrite = m.funcType(Seq(I32, I32), Seq(I32))
    val tWriteOpts = m.funcType(Seq(I32, I32, I32, I32), Seq(I32))
    val tVarint = m.funcType(Seq(I32), Seq(I32))

    val fAbi = m.importFunc("redpanda_transform", "check_abi_version_1", tVoid)
    val fBatchHeader =
      m.importFunc("redpanda_transform", "read_batch_header", tBatchHeader)
    val fNextRecord =
      m.importFunc("redpanda_transform", "read_next_record", tNextRecord)
    val fWrite = m.importFunc("redpanda_transform", "write_record", tWrite)
    val fWriteOpts = m.importFunc("redpanda_transform",
      "write_record_with_options", tWriteOpts)

    m.memory(min = 1, max = Some(64))
    extraData.foreach { case (off, bytes) => m.data(off, bytes) }
    val gPos = m.global(I32, mutable = true)(_.i32Const(0))

    // readVarint(p) -> value (Go zigzag varint); cursor lands in gPos.
    // locals: 0=p 1=u 2=shift 3=byte
    val fVarint = m.func(tVarint, locals = Seq(I32, I32, I32)) { c =>
      c.i32Const(0).localSet(1)
      c.i32Const(0).localSet(2)
      c.loop() {
        c.localGet(0).i32Load8U().localSet(3)
        c.localGet(0).i32Const(1).i32Add().localSet(0)
        c.localGet(1)
        c.localGet(3).i32Const(0x7f).i32And()
        c.localGet(2).i32Shl()
        c.i32Or().localSet(1)
        c.localGet(2).i32Const(7).i32Add().localSet(2)
        c.localGet(3).i32Const(0x80).i32And()
        c.brIf(0)
      }
      c.localGet(0).globalSet(gPos)
      c.localGet(1).i32Const(1).i32ShrU()
      c.i32Const(0).localGet(1).i32Const(1).i32And().i32Sub()
      c.i32Xor()
    }

    val fStart = m.func(tVoid,
      locals = Seq(I32, I32, I32, I32, I32, I32, I32, I32, I32)) { c =>
      c.call(fAbi)
      c.block() { // exit
        c.loop() { // batches
          (0 until 10).foreach(_ => c.i32Const(0)) // arg1 = countPtr = addr 0
          c.call(fBatchHeader).localSet(0)
          c.localGet(0).i32Const(0).i32LtS()
          c.brIf(1)
          // grow memory until BufPtr + maxSize fits
          c.block() {
            c.loop() {
              c.memorySize().i32Const(16).i32Shl()
              c.localGet(0).i32Const(BufPtr).i32Add()
              c.i32GeS()
              c.brIf(1)
              c.i32Const(1).memoryGrow()
              c.i32Const(-1).i32Eq()
              c.ifThen()(c.unreachable())
              c.br(0)
            }
          }
          c.i32Const(0).i32Load().localSet(1) // count
          c.i32Const(0).localSet(2)
          c.block() {
            c.loop() { // records
              c.localGet(2).localGet(1).i32GeU()
              c.brIf(1)
              c.i32Const(AttrsPtr).i32Const(TsPtr).i32Const(OffPtr)
                .i32Const(BufPtr).localGet(0)
              c.call(fNextRecord).localSet(3)
              c.localGet(3).i32Const(0).i32LtS()
              c.ifThen()(c.unreachable())
              // parse: k = varint; skip key bytes; vlen = varint
              c.i32Const(BufPtr).call(fVarint).localSet(4)
              c.localGet(4).i32Const(0).i32GtS()
              c.ifThen() {
                c.globalGet(gPos).localGet(4).i32Add().globalSet(gPos)
              }
              c.globalGet(gPos).call(fVarint).localSet(5)
              perRecord(m, c, fVarint, gPos, fWrite, fWriteOpts)
              c.localGet(2).i32Const(1).i32Add().localSet(2)
              c.br(0)
            }
          }
          c.br(0)
        }
      }
    }
    m.exportFunc("_start", fStart)
    m.build()
  }

  /** Reverses the value bytes of every record in place (key and
    * headers pass through — positions after the value are untouched).
    */
  def reverseValue(): Array[Byte] = build { (_, c, _, gPos, fWrite, _) =>
    // a = value start, b = value end - 1 (vlen may be -1 = nil: no-op)
    c.globalGet(gPos).localSet(6)
    c.globalGet(gPos).localGet(5).i32Add().i32Const(1).i32Sub().localSet(7)
    c.block() {
      c.loop() {
        c.localGet(6).localGet(7).i32GeS()
        c.brIf(1)
        c.localGet(6).i32Load8U().localSet(8)
        c.localGet(6).localGet(7).i32Load8U().i32Store8()
        c.localGet(7).localGet(8).i32Store8()
        c.localGet(6).i32Const(1).i32Add().localSet(6)
        c.localGet(7).i32Const(1).i32Sub().localSet(7)
        c.br(0)
      }
    }
    c.i32Const(BufPtr).localGet(3).call(fWrite).drop()
  }

  /** Filter/route guest: drops records whose value starts with `#`,
    * routes values starting with `!` to topic "alt" via
    * `write_record_with_options`, passes the rest through unchanged.
    */
  def filterRoute(): Array[Byte] = {
    // options blob: key 0x01 + sized("alt") — zigzag varint of 3 = 0x06
    val opts = Array[Byte](0x01, 0x06, 'a', 'l', 't')
    build(perRecord = { (_, c, _, gPos, fWrite, fWriteOpts) =>
      c.localGet(5).i32Const(0).i32GtS()
      c.ifThenElse() {
        c.globalGet(gPos).i32Load8U().localSet(8)
        c.localGet(8).i32Const('#'.toInt).i32Eq()
        c.ifThenElse()(c.nop()) {
          c.localGet(8).i32Const('!'.toInt).i32Eq()
          c.ifThenElse() {
            c.i32Const(BufPtr).localGet(3)
              .i32Const(OptsPtr).i32Const(opts.length)
              .call(fWriteOpts).drop()
          } {
            c.i32Const(BufPtr).localGet(3).call(fWrite).drop()
          }
        }
      } {
        c.i32Const(BufPtr).localGet(3).call(fWrite).drop()
      }
    }, extraData = Seq((OptsPtr, opts)))
  }
}
