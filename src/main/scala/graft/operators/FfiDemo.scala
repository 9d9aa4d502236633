package graft.operators

/** Demo shared library for the `ffi` gates/specs, compiled on demand
  * with the system C compiler (the inverse of the wasm situation: no
  * wasm toolchain but a perfectly good cc). The exported functions
  * mirror the reference's test plugin surface
  * (internal/impl/ffi/testdata/plugin.cc — same C ABI shapes, original
  * source): byte* in/out, int32/int64 args, int32/int64/void returns.
  */
object FfiDemo {

  val source: String =
    """#include <stdint.h>
      |int32_t GraftReverseBytes(void *input, void *output, int32_t len) {
      |  char *s = (char *)input, *d = (char *)output;
      |  for (int32_t i = 0; i < len; i++) d[i] = s[len - 1 - i];
      |  return len;
      |}
      |int64_t GraftAddInt64(int64_t a, int64_t b) { return a + b; }
      |int32_t GraftUpperBits(int64_t v) { return (int32_t)(v >> 32); }
      |static int64_t GRAFT_STATE = 0;
      |void GraftSetState(int64_t v) { GRAFT_STATE = v; }
      |int64_t GraftGetState(void) { return GRAFT_STATE; }
      |void GraftAssignAll(void *p, int64_t len, int32_t val) {
      |  char *d = (char *)p;
      |  for (int64_t i = 0; i < len; i++) d[i] = (char)val;
      |}
      |""".stripMargin

  @volatile private var builtPath: String = null

  /** Compile (once per JVM) and return the library path. */
  def ensureLib(): String = synchronized {
    if (builtPath != null) return builtPath
    val dir = java.nio.file.Files.createTempDirectory("graft-ffi")
    val c = dir.resolve("graft_plugin.c")
    val so = dir.resolve("graft_plugin.so")
    java.nio.file.Files.write(c, source.getBytes("UTF-8"))
    val p = new ProcessBuilder("cc", "-shared", "-fPIC", "-O2",
      c.toString, "-o", so.toString).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    if (p.waitFor() != 0)
      throw new IllegalStateException(s"cc failed: $out")
    builtPath = so.toString
    builtPath
  }
}
