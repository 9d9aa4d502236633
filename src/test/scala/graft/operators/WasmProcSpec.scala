package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.wasm.{DemoModules, WasmAsm, WasmModule}

/** The `wasm` processor contract (reference internal/impl/wasm/
  * processor_wazero_test.go — behaviors re-asserted over graft's own
  * engine, no code ported).
  */
class WasmProcSpec extends SparkSpec {

  import spark.implicits._

  private def envelope(values: String*) =
    values.toSeq.toDF("value")
      .withColumn("metadata", map().cast("map<string,string>"))
      .withColumn("error", lit(null).cast("string"))

  test("uppercase module mutates content and sets metadata per message") {
    val out = Wasm.processor(envelope("hello world-42", "o", ""),
        DemoModules.upperLen())
      .select("value", "metadata", "error").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("HELLO WORLD-42", "O", ""))
    assert(out.map(_.getMap[String, String](1)("wasm_len")).toSeq ==
      Seq("14", "1", "0"))
    assert(out.forall(_.isNullAt(2)))
  }

  test("guest state is per-partition: heap reset keeps memory bounded") {
    // 5k messages through one partition: a leaking allocator would
    // exhaust the 16-page memory cap (1 MiB) and trap
    val many = envelope(Seq.fill(5000)("abcdefghij" * 8): _*)
      .repartition(1)
    val out = Wasm.processor(many, DemoModules.upperLen())
      .select("value", "error").collect()
    assert(out.length == 5000)
    assert(out.forall(_.isNullAt(1)))
    assert(out.head.getString(0) == "ABCDEFGHIJ" * 8)
  }

  test("a trapping module lands on the error channel, not the task") {
    val m = new WasmAsm.ModuleBuilder
    val tVoid = m.funcType(Nil, Nil)
    val tMalloc = m.funcType(Seq(WasmModule.I32), Seq(WasmModule.I32))
    m.memory(1)
    m.exportFunc("malloc", m.func(tMalloc)(c => c.i32Const(64)))
    m.exportFunc("process", m.func(tVoid)(c => c.unreachable()))
    val out = Wasm.processor(envelope("x"), m.build())
      .select("value", "error").collect()
    assert(out.head.getString(0) == "x") // content untouched
    assert(out.head.getString(1).contains("unreachable"))
  }

  test("a module without the exported function fails the plan, not the tasks") {
    val m = new WasmAsm.ModuleBuilder
    val tVoid = m.funcType(Nil, Nil)
    m.memory(1)
    m.exportFunc("other", m.func(tVoid)(_ => ()))
    val e = intercept[graft.wasm.WasmInterp.LinkError](
      Wasm.processor(envelope("x"), m.build()))
    assert(e.getMessage.contains("process"))
  }

  test("rust-style allocator (allocate/deallocate) is honored") {
    // allocate = bump allocator under a different export name; the
    // host must route inbound allocations through it
    val m = new WasmAsm.ModuleBuilder
    import WasmModule.{I32, I64}
    val tAsBytes = m.funcType(Nil, Seq(I64))
    val tSetBytes = m.funcType(Seq(I32, I32), Nil)
    val fAsBytes = m.importFunc("benthos_wasm", "v0_msg_as_bytes", tAsBytes)
    val fSetBytes = m.importFunc("benthos_wasm", "v0_msg_set_bytes", tSetBytes)
    m.memory(1, Some(4))
    val gHeap = m.global(I32, mutable = true)(_.i32Const(1024))
    val tAlloc = m.funcType(Seq(I32), Seq(I32))
    val fAlloc = m.func(tAlloc, locals = Seq(I32)) { c =>
      c.globalGet(gHeap).localSet(1)
      c.localGet(1).localGet(0).i32Add().globalSet(gHeap)
      c.localGet(1)
    }
    val tDealloc = m.funcType(Seq(I32, I32), Nil)
    val fDealloc = m.func(tDealloc)(_ => ())
    val tVoid = m.funcType(Nil, Nil)
    // process: reverse no — just echo content back (ptr/len passthrough)
    val fProcess = m.func(tVoid, locals = Seq(I64)) { c =>
      c.i32Const(1024).globalSet(gHeap)
      c.call(fAsBytes).localSet(0)
      c.localGet(0).i64Const(32).i64ShrU().i32WrapI64()
      c.localGet(0).i64Const(0xffffffffL).i64And().i32WrapI64()
      c.call(fSetBytes)
    }
    m.exportFunc("allocate", fAlloc)
    m.exportFunc("deallocate", fDealloc)
    m.exportFunc("process", fProcess)
    val out = Wasm.processor(envelope("roundtrip"), m.build())
      .select("value", "error").collect()
    assert(out.head.getString(0) == "roundtrip")
    assert(out.head.isNullAt(1))
  }
}
