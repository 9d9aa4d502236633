package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ffi._

/** `ffi` processor contract (reference internal/impl/ffi/processor.go,
  * processor_test.go — behaviors re-asserted over the JEP-412 downcall
  * bridge; the demo .so is compiled by FfiDemo with the system cc).
  */
class FfiSpec extends SparkSpec {

  import spark.implicits._

  private lazy val lib = FfiDemo.ensureLib()

  private def envelope(values: String*) =
    values.toSeq.toDF("value")
      .withColumn("metadata", map().cast("map<string,string>"))
      .withColumn("error", lit(null).cast("string"))

  test("direct invoke: int64 arithmetic round-trips") {
    val out = Ffi.invoke(lib, "GraftAddInt64",
      Signature(RInt64, Seq(Param(PInt64), Param(PInt64))),
      Seq(40L, 2L))
    assert(out == Seq(42L))
  }

  test("direct invoke: int32 return narrows correctly") {
    val out = Ffi.invoke(lib, "GraftUpperBits",
      Signature(RInt32, Seq(Param(PInt64))),
      Seq((7L << 32) | 9L))
    assert(out == Seq(7L))
  }

  test("direct invoke: void return with an out buffer") {
    val out = Ffi.invoke(lib, "GraftAssignAll",
      Signature(RVoid,
        Seq(Param(PBytePtr, out = true), Param(PInt64), Param(PInt32))),
      Seq("....", 4L, 'x'.toLong))
    assert(out.map { case b: Array[Byte] => new String(b, "UTF-8") } ==
      Seq("xxxx"))
  }

  test("direct invoke: library-global state persists across calls") {
    Ffi.invoke(lib, "GraftSetState",
      Signature(RVoid, Seq(Param(PInt64))), Seq(99L))
    val got = Ffi.invoke(lib, "GraftGetState", Signature(RInt64, Nil), Nil)
    assert(got == Seq(99L))
  }

  test("processor: reverse via byte* in/out, result array shape") {
    val out = Ffi.processor(envelope("hello", "ab"),
      lib, "GraftReverseBytes",
      Signature(RInt32,
        Seq(Param(PBytePtr), Param(PBytePtr, out = true), Param(PInt32))),
      "root = [content(), content(), content().length()]")
    val got = out.select("value", "error").collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("""[5,"olleh"]""", """[2,"ba"]"""))
    assert(got.forall(_.isNullAt(1)))
  }

  test("processor: args from metadata reach integer parameters") {
    val in = Seq(("m1", Map("base" -> "1000")))
      .toDF("value", "metadata")
      .withColumn("error", lit(null).cast("string"))
    val out = Ffi.processor(in, lib, "GraftAddInt64",
      Signature(RInt64, Seq(Param(PInt64), Param(PInt64))),
      """root = [meta("base").number(), 23]""")
    assert(out.select("value").as[String].collect().toSeq == Seq("[1023]"))
  }

  test("missing symbol fails at plan time") {
    val e = intercept[IllegalArgumentException] {
      Ffi.processor(envelope("x"), lib, "NoSuchFn",
        Signature(RVoid, Nil), "root = []")
    }
    assert(e.getMessage.contains("NoSuchFn"))
  }

  test("a bad argument count lands on the error channel, not the task") {
    val out = Ffi.processor(envelope("x"), lib, "GraftAddInt64",
      Signature(RInt64, Seq(Param(PInt64), Param(PInt64))),
      "root = [1]")
    val row = out.select("value", "error").collect().head
    assert(row.getString(1) != null && row.getString(1).startsWith("ffi:"))
  }

  test("out is rejected on non-pointer parameters") {
    intercept[IllegalArgumentException] {
      Param(PInt32, out = true)
    }
  }
}
