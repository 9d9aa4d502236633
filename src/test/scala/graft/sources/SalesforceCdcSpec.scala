package graft.sources

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** salesforce_cdc contract (internal/impl/salesforce/salesforcegrpc):
  * Pub/Sub Subscribe over h2c gRPC, Avro payload round-trip via
  * GetSchema, replay presets, checkpoint resume, metadata auth.
  */
class SalesforceCdcSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val auth = SalesforceCdc.Auth("tok", "https://inst", "tid")

  private val orderSchema =
    """{"type":"record","name":"OrderChangeEvent","fields":[
      |{"name":"ChangeEventHeader","type":{"type":"record",
      |  "name":"ChangeEventHeader","fields":[
      |  {"name":"entityName","type":"string"},
      |  {"name":"changeType","type":"string"},
      |  {"name":"recordIds","type":{"type":"array","items":"string"}}]}},
      |{"name":"Status__c","type":"string"},
      |{"name":"Price__c","type":"double"}]}""".stripMargin

  private def newServer(): SalesforceCdc.Server = {
    val srv = new SalesforceCdc.Server(auth, batchPerResponse = 2)
    srv.registerSchema("order-v1", orderSchema)
    srv
  }

  test("avro payloads decode through GetSchema; replay ids order events") {
    val srv = newServer()
    try {
      srv.publish("/data/OrderChangeEvent", "order-v1", "Order__c",
        "CREATE", "r1", """{"Status__c":"N","Price__c":10.5}""")
      srv.publish("/data/OrderChangeEvent", "order-v1", "Order__c",
        "UPDATE", "r1", """{"Status__c":"U","Price__c":11.0}""")
      srv.publish("/data/OrderChangeEvent", "order-v1", "Order__c",
        "DELETE", "r1", """{"Status__c":"","Price__c":0.0}""")
      val evs = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/OrderChangeEvent").collect().sortBy(_.replayId)
      assert(evs.map(_.changeType).toSeq == Seq("CREATE", "UPDATE", "DELETE"))
      assert(evs.forall(_.entity == "Order__c"))
      assert(evs.forall(_.recordId == "r1"))
      val up = mapper.readTree(evs(1).payloadJson)
      assert(up.get("Status__c").asText == "U" &&
        up.get("Price__c").asDouble == 11.0)
      assert(evs.map(_.replayId).toSeq == Seq(1L, 2L, 3L))
      // 3 events with batchPerResponse=2 → the multi-response path ran
    } finally srv.stop()
  }

  test("checkpoint resume uses CUSTOM preset; LATEST starts from now") {
    val srv = newServer()
    try {
      val ck = Files.createTempFile("sfdc", ".replay").toString
      srv.publish("/data/OrderChangeEvent", "order-v1", "Order__c",
        "CREATE", "a", """{"Status__c":"N","Price__c":1.0}""")
      val r1 = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/OrderChangeEvent", Some(ck)).collect()
      assert(r1.length == 1)
      srv.publish("/data/OrderChangeEvent", "order-v1", "Order__c",
        "CREATE", "b", """{"Status__c":"N","Price__c":2.0}""")
      val r2 = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/OrderChangeEvent", Some(ck)).collect()
      assert(r2.length == 1 && r2.head.recordId == "b",
        "CUSTOM replay from the checkpointed id — no replay of 'a'")
      val r3 = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/OrderChangeEvent", Some(ck)).collect()
      assert(r3.isEmpty, "empty sweep (keepalive response only)")
      // LATEST ignores history entirely
      val latest = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/OrderChangeEvent", preset = SalesforceCdc.PresetLatest)
        .collect()
      assert(latest.isEmpty)
    } finally srv.stop()
  }

  test("topic isolation and num_requested flow bound") {
    val srv = newServer()
    try {
      (1 to 10).foreach(i => srv.publish("/data/A", "order-v1", "A__c",
        "CREATE", s"a$i", s"""{"Status__c":"N","Price__c":$i.0}"""))
      srv.publish("/data/B", "order-v1", "B__c", "CREATE", "b1",
        """{"Status__c":"N","Price__c":0.5}""")
      val a = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/A", numRequested = 4).collect()
      assert(a.length == 4, "num_requested bounds the fetch")
      assert(a.forall(_.entity == "A__c"))
    } finally srv.stop()
  }

  test("streamed admission spills beyond admitChunk (bounded driver heap)") {
    val srv = newServer() // batchPerResponse = 2 → messages straddle
    try {
      (1 to 123).foreach(i => srv.publish("/data/A", "order-v1", "A__c",
        "CREATE", s"r$i", s"""{"Status__c":"N","Price__c":$i.0}"""))
      val got = SalesforceCdc.read(spark, "127.0.0.1", srv.port, auth,
        "/data/A", numRequested = 100000, admitChunk = 40).collect()
      assert(got.length == 123)
      assert(got.map(_.replayId).distinct.length == 123)
      assert(SalesforceCdc.lastAdmissionChunks >= 3,
        s"123 events at admitChunk=40 must spill " +
          s"(${SalesforceCdc.lastAdmissionChunks})")
    } finally srv.stop()
  }

  test("bad auth metadata is UNAUTHENTICATED") {
    val srv = newServer()
    try {
      val e = intercept[IllegalStateException] {
        SalesforceCdc.read(spark, "127.0.0.1", srv.port,
          SalesforceCdc.Auth("WRONG", "https://inst", "tid"),
          "/data/OrderChangeEvent").collect()
      }
      assert(e.getMessage.contains("grpc-status 16"))
    } finally srv.stop()
  }
}
