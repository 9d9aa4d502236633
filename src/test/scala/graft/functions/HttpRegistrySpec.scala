package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.{HttpSchemaProvider, MapSchemaProvider}
import graft.operators.Http

/** Contract tests for the HTTP-backed schema registry provider
  * (internal/impl/confluent/sr/client.go semantics over the pluggable
  * Http.Client transport): REST paths, JSON envelopes, subject
  * escaping, the id cache (fetch-once, pinned the same way the
  * reference's decode test counts server hits), and the non-caching of
  * misses.
  */
class HttpRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val schemaE =
    """{"type":"record","name":"e","fields":[
      |{"name":"id","type":"long"},{"name":"t","type":"string"}]}"""
      .stripMargin.replace("\n", "")

  /** Stub transport that records every request URL it serves. */
  private def countingTransport(byId: Map[Int, String],
                                bySubject: Map[String, Int] = Map.empty)
      : (Http.Client, scala.collection.mutable.ArrayBuffer[String]) = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val inner = HttpSchemaProvider.stubTransport(byId, bySubject)
    val client: Http.Client = reqs => {
      seen ++= reqs.map(_.url)
      inner(reqs)
    }
    (client, seen)
  }

  test("schemaFor resolves over the REST path and caches by id") {
    val (client, seen) = countingTransport(Map(3 -> schemaE))
    val p = new HttpSchemaProvider("stub://registry", client = client)
    assert(p.schemaFor(3).contains(schemaE))
    assert(p.schemaFor(3).contains(schemaE))
    assert(seen.toSeq == Seq("stub://registry/schemas/ids/3"),
      s"expected exactly one fetch for a cached id, saw: $seen")
  }

  test("an unknown id returns None and the miss is not cached") {
    val (client, seen) = countingTransport(Map(3 -> schemaE))
    val p = new HttpSchemaProvider("stub://registry", client = client)
    assert(p.schemaFor(9).isEmpty)
    assert(p.schemaFor(9).isEmpty)
    // a late-registered schema must resolve on retry, so both misses
    // reach the transport
    assert(seen.size == 2)
  }

  test("latestFor escapes the subject as one path segment and caches") {
    val (client, seen) = countingTransport(
      Map(7 -> schemaE), Map("main/common" -> 7))
    val p = new HttpSchemaProvider("stub://registry", client = client)
    assert(p.latestFor("main/common").contains((7, schemaE)))
    assert(p.latestFor("main/common").contains((7, schemaE)))
    assert(seen.toSeq ==
      Seq("stub://registry/subjects/main%2Fcommon/versions/latest"))
  }

  test("lenient wire decode over a DataFrame: known ids resolve, unknown ids null") {
    CodecFunctions.register(spark)
    val p = new HttpSchemaProvider("stub://registry",
      client = HttpSchemaProvider.stubTransport(Map(1 -> schemaE)))
    val df = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 5))
      .toDF("id", "t", "sid")
      .withColumn("w", when($"sid" === 1, CodecFunctions.wireEncode(
          to_json(struct($"id", $"t")), schemaE, 1))
        .otherwise(CodecFunctions.wireEncode(
          to_json(struct($"id", $"t")), schemaE, 5)))
    val out = df
      .withColumn("dec", CodecFunctions.wireDecodeProvider($"w", p, lenient = true))
      .select($"id", get_json_object($"dec", "$.t").as("t_rt"))
      .orderBy($"id").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, Some("a")), (2L, Some("b")), (3L, None)))
  }

  test("config runner resolves a url: registry through the HTTP path") {
    CodecFunctions.register(spark)
    val input = Seq((1L, "x", 1), (2L, "y", 8)).toDF("id", "t", "sid")
      .withColumn("value", base64(
        when($"sid" === 1, CodecFunctions.wireEncode(
          to_json(struct($"id", $"t")), schemaE, 1))
        .otherwise(CodecFunctions.wireEncode(
          to_json(struct($"id", $"t")), schemaE, 8))))
      .select($"value", $"id")
    val yaml = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val node = yaml.readTree(
      s"""schema_registry_decode:
         |  url: stub://registry
         |  registry:
         |    schemas:
         |      1: $schemaE
         |""".stripMargin)
    val out = graft.config.Processors.compile(node, Map.empty)(input)
      .select($"id", get_json_object($"value", "$.t").as("t_rt"), $"error")
      .orderBy($"id")
      .as[(Long, Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, Some("x"), None),
      (2L, None, Some("schema registry: unknown schema id 8"))))
  }

  test("stubTransport serves the registry 404 error body for unknown ids") {
    val client = HttpSchemaProvider.stubTransport(Map.empty)
    val r = client(Seq(Http.Request(
      "stub://registry/schemas/ids/42", "GET", Map.empty, ""))).head
    assert(r.status == 404 && r.body.contains("40403"))
  }
}
