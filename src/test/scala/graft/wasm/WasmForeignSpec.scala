package graft.wasm

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Foreign-toolchain binaries through the graft.wasm engine. Every
  * module the decoder had seen before round 13 was assembled by its own
  * WasmAsm; these fixtures were built by clang/wasi-sdk (extracted from
  * the local Node.js 20 distribution, which embeds them base64-coded:
  * undici's llhttp HTTP parser and the cjs-module-lexer — both public
  * MIT-licensed projects) and exercise encodings and opcode mixes the
  * self-referential corpus can't: LLVM section layouts, br_table jump
  * tables, a shared function table with element segments, multi-page
  * data segments, and the wasi reactor `_initialize` convention.
  *
  * The llhttp case is a full EXECUTION differential, not just a decode:
  * the interpreter drives the real parser through request/response/
  * error traffic and the callback trace is compared against V8 running
  * the identical bytes (when `node` is present on the machine).
  */
class WasmForeignSpec extends AnyFunSuite {

  private val fixtureDir = Paths.get("src/test/resources/wasm")
  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(fixtureDir.resolve(name))

  test("clang-built cjs-module-lexer decodes: sections, exports, bodies") {
    val m = WasmModule.decode(fixture("cjs_module_lexer.wasm"))
    assert(m.imports.isEmpty)
    // counts V8 reports for the same bytes (WebAssembly.Module.exports)
    assert(m.exports.size == 14)
    assert(m.funcTypeIdx.size == 50)
    assert(m.exports.exists(e => e.name == "memory" && e.kind == 2))
    assert(m.exports.exists(e => e.name == "__heap_base" && e.kind == 3))
    // every function body decoded into structured instructions
    assert(m.codes.size == m.funcTypeIdx.size)
    assert(m.codes.forall(_.body.nonEmpty))
  }

  /** llhttp host callbacks: record the event trace like the reference's
    * wazero host module does (undici's llhttp ABI — 8 env imports).
    */
  private final class Recorder {
    val events = ArrayBuffer.empty[String]
    var inst: WasmInterp.Instance = _
    private def cb(name: String, withData: Boolean): WasmInterp.HostFn =
      args => {
        if (withData) {
          val at = args(1).toInt
          val len = args(2).toInt
          events += s"$name:${new String(inst.readBytes(at, len), UTF_8)}"
        } else events += name
        Array(0L)
      }
    val host: Map[(String, String), WasmInterp.HostFn] = Map(
      ("env", "wasm_on_message_begin") -> cb("begin", withData = false),
      ("env", "wasm_on_url") -> cb("url", withData = true),
      ("env", "wasm_on_status") -> cb("status", withData = true),
      ("env", "wasm_on_header_field") -> cb("field", withData = true),
      ("env", "wasm_on_header_value") -> cb("value", withData = true),
      ("env", "wasm_on_headers_complete") ->
        cb("headers_complete", withData = false),
      ("env", "wasm_on_body") -> cb("body", withData = true),
      ("env", "wasm_on_message_complete") ->
        cb("complete", withData = false))
  }

  /** Parse `payload` with the real llhttp on the graft interpreter;
    * returns (execute rc, method, keep-alive, event trace).
    */
  private def runLlhttp(payload: String, parserType: Long,
                        fixtureName: String = "llhttp.wasm")
      : (Long, Long, Long, Seq[String]) = {
    val m = WasmModule.decode(fixture(fixtureName))
    val rec = new Recorder
    val inst = new WasmInterp.Instance(m, rec.host)
    rec.inst = inst
    inst.invoke("_initialize")
    val p = inst.invoke("llhttp_alloc", parserType)(0)
    val bytes = payload.getBytes(UTF_8)
    val buf = inst.invoke("malloc", bytes.length.toLong)(0)
    inst.writeBytes(buf.toInt, bytes)
    val rc = inst.invoke("llhttp_execute", p, buf, bytes.length.toLong)(0)
    val method = inst.invoke("llhttp_get_method", p)(0)
    val keepAlive = inst.invoke("llhttp_should_keep_alive", p)(0)
    (rc, method, keepAlive, rec.events.toSeq)
  }

  test("clang-built llhttp EXECUTES: full request parse, correct trace") {
    val (rc, method, keepAlive, events) = runLlhttp(
      "POST /hello?x=1 HTTP/1.1\r\nHost: example.com\r\n" +
        "Content-Length: 5\r\n\r\nabcde", parserType = 1L)
    assert(rc == 0, s"HPE errno $rc")
    assert(method == 3L) // POST in llhttp's method enum
    assert(keepAlive == 1L)
    assert(events == Seq("begin", "url:/hello?x=1", "field:Host",
      "value:example.com", "field:Content-Length", "value:5",
      "headers_complete", "body:abcde", "complete"))
  }

  test("llhttp: chunked response body reassembles through br_table paths") {
    val (rc, _, _, events) = runLlhttp(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n", parserType = 2L)
    assert(rc == 0, s"HPE errno $rc")
    assert(events.contains("status:OK"))
    assert(events.filter(_.startsWith("body:")) ==
      Seq("body:Wiki", "body:pedia"))
    assert(events.last == "complete")
  }

  test("llhttp: malformed input surfaces the parser's own errno") {
    val (rc, _, _, _) =
      runLlhttp("NOT A REQUEST\r\n\r\n", parserType = 1L)
    assert(rc != 0) // llhttp rejects; the interpreter must not trap
  }

  test("llhttp_simd EXECUTES: the SIMD build parses identically to scalar") {
    // the wasi-sdk SIMD build (0xfd v128 opcodes — v128.const +
    // v128.store in this binary) must produce the exact scalar-build
    // behavior: same rc/method/keep-alive, same callback trace
    val payload = "POST /hello?x=1 HTTP/1.1\r\nHost: example.com\r\n" +
      "Content-Length: 5\r\n\r\nabcde"
    val scalar = runLlhttp(payload, parserType = 1L)
    val simd = runLlhttp(payload, parserType = 1L, "llhttp_simd.wasm")
    assert(simd == scalar)
    assert(simd._1 == 0L && simd._2 == 3L)
    // and the chunked-response path (br_table heavy)
    val chunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    assert(runLlhttp(chunked, 2L, "llhttp_simd.wasm") ==
      runLlhttp(chunked, 2L))
  }

  test("execution differential vs V8: identical trace on identical bytes") {
    for (fixtureName <- Seq("llhttp.wasm", "llhttp_simd.wasm"))
      v8Differential(fixtureName)
  }

  private def v8Differential(fixtureName: String): Unit = {
    val node = new java.io.File("/usr/bin/node")
    assume(node.canExecute, "node not available on this machine")
    val payload = "POST /hello?x=1 HTTP/1.1\r\nHost: example.com\r\n" +
      "Content-Length: 5\r\n\r\nabcde"
    val script =
      s"""const fs = require('fs');
         |const bytes = fs.readFileSync('${fixtureDir.resolve(fixtureName)}');
         |const events = [];
         |let mem;
         |const data = (name) => (p, at, len) => {
         |  events.push(name + ':' + Buffer.from(mem.buffer, at, len).toString());
         |  return 0; };
         |const plain = (name) => () => { events.push(name); return 0; };
         |(async () => {
         |  const { instance } = await WebAssembly.instantiate(bytes, { env: {
         |    wasm_on_message_begin: plain('begin'),
         |    wasm_on_url: data('url'),
         |    wasm_on_status: data('status'),
         |    wasm_on_header_field: data('field'),
         |    wasm_on_header_value: data('value'),
         |    wasm_on_headers_complete: plain('headers_complete'),
         |    wasm_on_body: data('body'),
         |    wasm_on_message_complete: plain('complete'),
         |  }});
         |  const e = instance.exports;
         |  mem = e.memory;
         |  e._initialize();
         |  const p = e.llhttp_alloc(1);
         |  const req = Buffer.from(${jsString(payload)});
         |  const buf = e.malloc(req.length);
         |  Buffer.from(mem.buffer, buf, req.length).set(req);
         |  const rc = e.llhttp_execute(p, buf, req.length);
         |  console.log(JSON.stringify({rc, method: e.llhttp_get_method(p),
         |    keepAlive: e.llhttp_should_keep_alive(p), events}));
         |})();
         |""".stripMargin
    val tmp = Files.createTempFile("llhttp_v8", ".js")
    Files.writeString(tmp, script)
    val proc = new ProcessBuilder("/usr/bin/node", tmp.toString).start()
    val out = new String(proc.getInputStream.readAllBytes(), UTF_8).trim
    assert(proc.waitFor() == 0,
      new String(proc.getErrorStream.readAllBytes(), UTF_8))
    val v8 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    val (rc, method, keepAlive, events) = runLlhttp(payload, 1L, fixtureName)
    assert(v8.get("rc").asLong == rc, fixtureName)
    assert(v8.get("method").asLong == method, fixtureName)
    assert(v8.get("keepAlive").asLong == keepAlive, fixtureName)
    val v8Events = {
      val b = Vector.newBuilder[String]
      v8.get("events").elements().forEachRemaining(e => b += e.asText)
      b.result()
    }
    assert(v8Events == events.toVector, fixtureName)
  }

  private def jsString(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\r", "\\r")
      .replace("\n", "\\n").replace("\"", "\\\"") + "\""

  // ── cjs-module-lexer: the second foreign EXECUTION differential ─────

  /** Drive the clang-built cjs lexer on the graft interpreter with its
    * real wire protocol (wrapper contract: addr = sa(len+1), UTF-16LE
    * source, status = parseCJS(addr, len, 0, 0, 0), then the
    * rre/ru/re span iterators; status 0 = success, 5/6/7 = ESM syntax).
    */
  private def runCjsLexer(src: String)
      : (Long, Seq[String], Seq[String], Seq[String], Long) = {
    val m = WasmModule.decode(fixture("cjs_module_lexer.wasm"))
    val inst = new WasmInterp.Instance(m)
    val w = src.length + 1
    val addr = inst.invoke("sa", w.toLong)(0).toInt
    val utf16 = new Array[Byte](2 * w)
    for (i <- 0 until src.length) {
      val c = src.charAt(i)
      utf16(2 * i) = (c & 0xff).toByte
      utf16(2 * i + 1) = ((c >> 8) & 0xff).toByte
    }
    inst.writeBytes(addr, utf16)
    // 6 declared params (the JS wrapper passes 5 — the JS-wasm API
    // zero-fills the missing trailing argument)
    val status = inst.invoke("parseCJS", addr.toLong, src.length.toLong,
      0L, 0L, 0L, 0L)(0)
    def span(s: Long, e: Long): String = src.substring(s.toInt, e.toInt)
    def drain(next: String, a: String, b: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      while (inst.invoke(next)(0) != 0L)
        out += span(inst.invoke(a)(0), inst.invoke(b)(0))
      out.result()
    }
    val reexports = drain("rre", "res", "ree")
    val unsafe = drain("ru", "us", "ue")
    val exports = drain("re", "es", "ee")
    val errPos = if (status != 0L) inst.invoke("e")(0) else -1L
    (status, exports, reexports, unsafe, errPos)
  }

  private val lexerSources = Seq(
    "exports.alpha = 1; module.exports.beta = 2;",
    "module.exports = require(\"./other.js\");",
    "Object.defineProperty(exports, \"gamma\", { get(){ return 1 } });",
    "export const esm = 1;", // ESM syntax → nonzero status
    "exports['a-b'] = 0; exports.ok = true; // trailing comment")

  test("clang-built cjs-module-lexer EXECUTES: exports/reexports/errors") {
    val (s1, e1, r1, u1, _) = runCjsLexer(lexerSources.head)
    assert(s1 == 0L && e1 == Seq("alpha", "beta") && r1.isEmpty && u1.isEmpty)
    val (s2, e2, r2, _, _) = runCjsLexer(lexerSources(1))
    assert(s2 == 0L && e2.isEmpty && r2 == Seq("\"./other.js\""))
    val (s3, _, _, u3, _) = runCjsLexer(lexerSources(2))
    assert(s3 == 0L && u3 == Seq("\"gamma\""))
    val (s4, _, _, _, p4) = runCjsLexer(lexerSources(3))
    assert(s4 == 7L && p4 == 7L) // ESM `export` keyword at position 7
  }

  test("cjs-lexer execution differential vs V8: identical on all sources") {
    val node = new java.io.File("/usr/bin/node")
    assume(node.canExecute, "node not available on this machine")
    val srcList = lexerSources.map(jsString).mkString("[", ",", "]")
    val script =
      s"""const fs = require('fs');
         |const bytes = fs.readFileSync('${fixtureDir.resolve("cjs_module_lexer.wasm")}');
         |(async () => {
         |  const { instance } = await WebAssembly.instantiate(bytes, {});
         |  const x = instance.exports;
         |  const results = [];
         |  for (const src of $srcList) {
         |    const w = src.length + 1;
         |    const need = (x.__heap_base.value || x.__heap_base) + 4*w
         |      - x.memory.buffer.byteLength;
         |    if (need > 0) x.memory.grow(Math.ceil(need / 65536));
         |    const addr = x.sa(w);
         |    const mem = new Uint16Array(x.memory.buffer, addr, w);
         |    for (let i = 0; i < src.length; i++) mem[i] = src.charCodeAt(i);
         |    mem[src.length] = 0;
         |    const status = x.parseCJS(addr, src.length, 0, 0, 0);
         |    const reexports = [], unsafe = [], exports = [];
         |    while (x.rre()) reexports.push(src.slice(x.res(), x.ree()));
         |    while (x.ru()) unsafe.push(src.slice(x.us(), x.ue()));
         |    while (x.re()) exports.push(src.slice(x.es(), x.ee()));
         |    results.push({status, exports, reexports, unsafe,
         |      errPos: status ? x.e() : -1});
         |  }
         |  console.log(JSON.stringify(results));
         |})();
         |""".stripMargin
    val js = Files.createTempFile("cjs_v8", ".js")
    Files.writeString(js, script)
    val proc = new ProcessBuilder("/usr/bin/node", js.toString).start()
    val out = new String(proc.getInputStream.readAllBytes(), UTF_8).trim
    assert(proc.waitFor() == 0,
      new String(proc.getErrorStream.readAllBytes(), UTF_8))
    val v8 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
    lexerSources.zipWithIndex.foreach { case (src, i) =>
      val (status, exports, reexports, unsafe, errPos) = runCjsLexer(src)
      val r = v8.get(i)
      def arr(f: String): Seq[String] = {
        val b = Seq.newBuilder[String]
        r.get(f).elements().forEachRemaining(e => b += e.asText)
        b.result()
      }
      assert(r.get("status").asLong == status, src)
      assert(arr("exports") == exports, src)
      assert(arr("reexports") == reexports, src)
      assert(arr("unsafe") == unsafe, src)
      assert(r.get("errPos").asLong == errPos, src)
    }
  }
}
