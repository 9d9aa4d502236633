package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for the bulk `schema_registry` input/output against
  * [[SchemaRegistryIO.InMemoryServer]].
  */
class SchemaRegistryIOSpec extends SparkSpec {
  import SchemaRegistryIO.InMemoryServer._

  private val seed = Seq(
    Entry("orders-value", 1, 3, """{"type":"string"}"""),
    Entry("orders-value", 2, 7, """{"type":"int"}"""),
    Entry("users-value", 1, 5, """{"type":"long"}"""),
    Entry("audit-key", 1, 1, """{"type":"bytes"}""", deleted = true))

  test("reads every live subject-version sorted by id with metadata") {
    val t = Transport(seed, subjectCompat = Map("users-value" -> "FULL"))
    val df = SchemaRegistryIO.read(spark, "mem://x", client = t)
    val rows = df.orderBy("__seq").collect()
    assert(rows.length == 3) // deleted excluded
    val ids = rows.map(r => new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(r.getString(0)).path("id").asInt())
    assert(ids.toSeq == Seq(3, 5, 7), "fetch_in_order sorts by schema id")
    val m = rows.head.getMap[String, String](1)
    assert(m("schema_registry_subject") == "orders-value")
    assert(m("schema_registry_version") == "1")
    assert(m("schema_registry_subject_compatibility_level") == "BACKWARD",
      "global config is the fallback level")
    val mu = rows(1).getMap[String, String](1)
    assert(mu("schema_registry_subject_compatibility_level") == "FULL")
  }

  test("subject_filter and include_deleted select the walk") {
    val t = Transport(seed)
    assert(SchemaRegistryIO.read(spark, "mem://x", client = t,
      subjectFilter = "^orders").count() == 2)
    assert(SchemaRegistryIO.read(spark, "mem://x", client = t,
      subjectFilter = "^audit", includeDeleted = true).count() == 1)
    assert(SchemaRegistryIO.read(spark, "mem://x", client = t,
      subjectFilter = "^audit").count() == 0)
  }

  test("registry sync: input → output registers into an empty registry") {
    val srcName = "srs_" + java.util.UUID.randomUUID.toString.take(8)
    val dstName = "srd_" + java.util.UUID.randomUUID.toString.take(8)
    val dst = Transport(Nil)
    SchemaRegistryIO.registerClient(srcName, Transport(seed))
    SchemaRegistryIO.registerClient(dstName, dst)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  schema_registry:
         |    url: mem://$srcName
         |pipeline:
         |  processors: []
         |output:
         |  schema_registry:
         |    url: mem://$dstName
         |    subject: "$${!metadata(\\"schema_registry_subject\\")}"
         |""".stripMargin)
    val got = dst.entries.asScala.map(e => (e.subject, e.schema)).toSet
    assert(got == Set(
      ("orders-value", """{"type":"string"}"""),
      ("orders-value", """{"type":"int"}"""),
      ("users-value", """{"type":"long"}""")))
    // versions renumber per destination subject, ids dedup per schema
    assert(dst.entries.asScala.filter(_.subject == "orders-value")
      .map(_.version).sorted == Seq(1, 2))
  }

  test("references survive the sync as a real array, never a string") {
    val refs = """[{"name":"Addr","subject":"addr-value","version":1}]"""
    val srcName = "srr_" + java.util.UUID.randomUUID.toString.take(8)
    val dstName = "drr_" + java.util.UUID.randomUUID.toString.take(8)
    val dst = Transport(Nil)
    SchemaRegistryIO.registerClient(srcName, Transport(Seq(
      Entry("addr-value", 1, 1, """{"type":"record"}"""),
      Entry("cust-value", 1, 2, """{"type":"record2"}""", references = refs))))
    SchemaRegistryIO.registerClient(dstName, dst)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  schema_registry:
         |    url: mem://$srcName
         |pipeline:
         |  processors: []
         |output:
         |  schema_registry:
         |    url: mem://$dstName
         |    subject: "$${!metadata(\\"schema_registry_subject\\")}"
         |""".stripMargin)
    // the server 422s a string-typed references field, so a recorded
    // entry proves the POST carried a real array; assert content too
    val got = dst.entries.asScala.find(_.subject == "cust-value").get
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(m.readTree(got.references) == m.readTree(refs))
    assert(dst.entries.asScala.find(_.subject == "addr-value")
      .get.references.isEmpty, "absent references stay absent")
  }

  test("server rejects string-typed references with 422") {
    val t = Transport(Nil)
    val resp = t(Seq(graft.operators.Http.Request(
      "mem://x/subjects/s/versions", "POST", Map.empty,
      """{"schema":"{}","references":"[{\"name\":\"A\"}]"}"""))).head
    assert(resp.status == 422 && resp.body.contains("references"))
  }

  test("posting an identical schema returns the existing id") {
    val t = Transport(Seq(Entry("s", 1, 9, """{"type":"string"}""")))
    val resp = t(Seq(graft.operators.Http.Request(
      "mem://x/subjects/s/versions", "POST", Map.empty,
      """{"schema":"{\"type\":\"string\"}"}"""))).head
    assert(resp.body == """{"id":9}""")
  }
}
