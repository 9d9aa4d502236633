package graft.wasm

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import WasmModule.I32

/** Bulk-memory proposal coverage (memory.init / data.drop /
  * memory.copy / memory.fill + passive data segments) — the encoding
  * family LLVM emits whenever a guest calls memcpy/memset; added in
  * r13 alongside the foreign-binary fixtures so toolchain-built
  * modules that use it run instead of failing at decode. Every module
  * here is assembled by WasmAsm, executed by WasmInterp, and (when
  * node is present) cross-validated byte-for-byte against V8.
  */
class WasmBulkMemorySpec extends AnyFunSuite {

  private val payload = "Hello, bulk memory!".getBytes(UTF_8)

  /** memory.init a passive segment at 16, memory.copy it to 128,
    * memory.fill 8×0x2a at 512; export a probe returning mem[addr].
    */
  private def buildModule(): Array[Byte] = {
    val m = new WasmAsm.ModuleBuilder
    m.memory(1, exportAs = Some("memory"))
    val seg = m.dataPassive(payload)
    val t = m.funcType(Seq(), Seq())
    val run = m.func(t) { c =>
      c.i32Const(16).i32Const(0).i32Const(payload.length)
        .memoryInit(seg)
      c.i32Const(128).i32Const(16).i32Const(payload.length)
        .memoryCopy()
      c.i32Const(512).i32Const(0x2a).i32Const(8).memoryFill()
      c.dataDrop(seg)
    }
    m.exportFunc("run", run)
    val probeT = m.funcType(Seq(I32), Seq(I32))
    val probe = m.func(probeT)(c => c.localGet(0).i32Load8U())
    m.exportFunc("probe", probe)
    // a second run would memory.init a DROPPED segment: traps iff n > 0
    val again = m.func(t) { c =>
      c.i32Const(0).i32Const(0).i32Const(1).memoryInit(seg)
    }
    m.exportFunc("init_after_drop", again)
    m.build()
  }

  test("memory.init/copy/fill with a passive segment, then data.drop") {
    val bytes = buildModule()
    val inst = new WasmInterp.Instance(WasmModule.decode(bytes))
    // passive segment must NOT be applied at instantiation
    assert(inst.readBytes(16, payload.length).forall(_ == 0))
    inst.invoke("run")
    assert(inst.readBytes(16, payload.length).sameElements(payload))
    assert(inst.readBytes(128, payload.length).sameElements(payload))
    assert(inst.readBytes(512, 8).forall(_ == 0x2a))
    assert(inst.readBytes(520, 4).forall(_ == 0))
    // init from a dropped segment traps (n > 0)
    val trap = intercept[WasmInterp.Trap](inst.invoke("init_after_drop"))
    assert(trap.getMessage.contains("memory.init"))
  }

  test("memory.copy is overlap-safe in both directions") {
    val m = new WasmAsm.ModuleBuilder
    m.memory(1, exportAs = Some("memory"))
    m.data(0, (0 until 16).map(_.toByte).toArray)
    val t = m.funcType(Seq(I32, I32, I32), Seq())
    val f = m.func(t)(c =>
      c.localGet(0).localGet(1).localGet(2).memoryCopy())
    m.exportFunc("copy", f)
    val inst = new WasmInterp.Instance(WasmModule.decode(m.build()))
    inst.invoke("copy", 4L, 0L, 12L) // forward overlap
    assert(inst.readBytes(4, 12).toSeq == (0 until 12).map(_.toByte))
    val inst2 = new WasmInterp.Instance(WasmModule.decode(m.build()))
    inst2.invoke("copy", 0L, 4L, 12L) // backward overlap
    assert(inst2.readBytes(0, 12).toSeq == (4 until 16).map(_.toByte))
  }

  test("out-of-bounds bulk ops trap") {
    val m = new WasmAsm.ModuleBuilder
    m.memory(1, exportAs = Some("memory"))
    val t = m.funcType(Seq(I32, I32, I32), Seq())
    val fc = m.func(t)(c =>
      c.localGet(0).localGet(1).localGet(2).memoryCopy())
    m.exportFunc("copy", fc)
    val ff = m.func(t)(c =>
      c.localGet(0).localGet(1).localGet(2).memoryFill())
    m.exportFunc("fill", ff)
    val inst = new WasmInterp.Instance(WasmModule.decode(m.build()))
    intercept[WasmInterp.Trap](inst.invoke("copy", 65530L, 0L, 100L))
    intercept[WasmInterp.Trap](inst.invoke("fill", 65530L, 0L, 100L))
  }

  test("differential vs V8: same bytes, same memory contents") {
    val node = new java.io.File("/usr/bin/node")
    assume(node.canExecute, "node not available on this machine")
    val bytes = buildModule()
    val wasmFile = Files.createTempFile("bulk", ".wasm")
    Files.write(wasmFile, bytes)
    val script =
      s"""const fs = require('fs');
         |const bytes = fs.readFileSync('$wasmFile');
         |(async () => {
         |  if (!WebAssembly.validate(bytes)) { console.log('INVALID'); return; }
         |  const { instance } = await WebAssembly.instantiate(bytes, {});
         |  const e = instance.exports;
         |  e.run();
         |  const mem = Buffer.from(e.memory.buffer);
         |  let trapped = false;
         |  try { e.init_after_drop(); } catch (err) { trapped = true; }
         |  console.log(JSON.stringify({
         |    at16: mem.slice(16, 16 + ${payload.length}).toString('base64'),
         |    at128: mem.slice(128, 128 + ${payload.length}).toString('base64'),
         |    fill: mem.slice(512, 520).toString('base64'),
         |    trapped }));
         |})();
         |""".stripMargin
    val js = Files.createTempFile("bulk_v8", ".js")
    Files.writeString(js, script)
    val proc = new ProcessBuilder("/usr/bin/node", js.toString).start()
    val out = new String(proc.getInputStream.readAllBytes(), UTF_8).trim
    assert(proc.waitFor() == 0,
      new String(proc.getErrorStream.readAllBytes(), UTF_8))
    assert(out != "INVALID", "V8 rejected the assembled module")
    val v8 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    val b64 = java.util.Base64.getEncoder
    val inst = new WasmInterp.Instance(WasmModule.decode(bytes))
    inst.invoke("run")
    assert(v8.get("at16").asText ==
      b64.encodeToString(inst.readBytes(16, payload.length)))
    assert(v8.get("at128").asText ==
      b64.encodeToString(inst.readBytes(128, payload.length)))
    assert(v8.get("fill").asText ==
      b64.encodeToString(inst.readBytes(512, 8)))
    assert(v8.get("trapped").asBoolean)
  }
}
