package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.wasm.TransformModules

/** `redpanda_data_transform` over real guest modules on the graft.wasm
  * engine (reference internal/impl/redpanda/processor_data_transform.go
  * — contract only). The guests parse the zigzag-varint record serde in
  * wasm code, so these cases pin the serde on BOTH sides of the
  * boundary.
  */
class RedpandaTransformSpec extends SparkSpec {

  import spark.implicits._

  private def env(values: Seq[(String, Map[String, String])]) =
    values.toDF("value", "metadata")
      .withColumn("error", lit(null).cast("string"))

  test("reverse guest reverses every value and keeps counts") {
    val in = env(Seq(
      ("hello", Map("h1" -> "a")),
      ("redpanda", Map.empty[String, String]),
      ("", Map.empty[String, String])))
    val out = RedpandaTransform.processor(in, TransformModules.reverseValue())
      .collect().map(r => r.getString(0)).sorted
    assert(out.toSeq == Seq("", "adnapder", "olleh"))
  }

  test("headers round-trip through the guest serde as metadata") {
    val in = env(Seq(("abc", Map("k1" -> "v1", "k2" -> "v2"))))
    val row = RedpandaTransform.processor(in, TransformModules.reverseValue())
      .collect().head
    assert(row.getString(0) == "cba")
    assert(row.getMap[String, String](1).toMap == Map("k1" -> "v1", "k2" -> "v2"))
    assert(row.isNullAt(2))
  }

  test("input key metadata serializes; output key lands where asked") {
    val in = env(Seq(("xy", Map("kafka_key" -> "K9"))))
    val row = RedpandaTransform.processor(in, TransformModules.reverseValue(),
      inputKeyMeta = Some("kafka_key"), outputKeyMeta = Some("out_key"))
      .collect().head
    assert(row.getString(0) == "yx")
    assert(row.getMap[String, String](1).get("out_key").contains("K9"))
  }

  test("filter guest drops '#' records and routes '!' to a topic") {
    val in = env(Seq(
      ("keep me", Map.empty[String, String]),
      ("#drop me", Map.empty[String, String]),
      ("!route me", Map.empty[String, String])))
    val rows = RedpandaTransform.processor(in, TransformModules.filterRoute())
      .collect().sortBy(_.getString(0))
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "!route me")
    assert(rows(0).getMap[String, String](1)
      .get(RedpandaTransform.OutputTopicMeta).contains("alt"))
    assert(rows(1).getString(0) == "keep me")
    assert(!rows(1).getMap[String, String](1)
      .contains(RedpandaTransform.OutputTopicMeta))
  }

  test("record count changes survive multi-chunk partitions") {
    val values = (0 until 997).map { i =>
      val v = if (i % 3 == 0) s"#drop$i" else s"keep$i"
      (v, Map.empty[String, String])
    }
    val out = RedpandaTransform.processor(
      env(values).repartition(4), TransformModules.filterRoute(),
      batchSize = 64)
    assert(out.count() == values.count(!_._1.startsWith("#")))
  }

  test("a module without _start fails at plan time") {
    val m = new graft.wasm.WasmAsm.ModuleBuilder
    val t = m.funcType(Nil, Nil)
    m.exportFunc("not_start", m.func(t)(_ => ()))
    m.memory(min = 1)
    val e = intercept[graft.wasm.WasmInterp.LinkError] {
      RedpandaTransform.processor(env(Seq(("x", Map.empty))), m.build())
    }
    assert(e.getMessage.contains("_start"))
  }
}
