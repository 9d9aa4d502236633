package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.S3.Credentials
import graft.SparkSpec

/** Streaming pollers for the round-11 CDC families: cursor-in /
  * payloads+cursor-out sweeps with no replay across sweeps.
  */
class CdcPollersSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def uid() = java.util.UUID.randomUUID.toString.replace("-", "")

  test("mongodb_cdc poller: snapshot sweep, then exactly the new events") {
    val name = "mcp_" + uid()
    val srv = Mongo.named(name)
    srv.seed("db", "t", Seq("""{"_id":1,"v":"seeded"}"""))
    val poll = MongoCdc.poller(s"mem://$name", "db", "t")
    val (p1, cur1) = poll(None)
    assert(p1.size == 1 && p1.head._2("operation") == "read",
      "first sweep = snapshot")
    val c = Mongo.clientFor(s"mem://$name", "db")
    c.insert("t", Seq(mapper.readTree("""{"_id":2,"v":"x"}""")))
    c.delete("t", mapper.readTree("""{"_id":1}"""), limit = 1)
    c.close()
    val (p2, cur2) = poll(cur1)
    assert(p2.map(_._2("operation")).toSeq == Seq("insert", "delete"),
      "resumed sweep sees only the workload")
    assert(mapper.readTree(p2.head._1).at("/doc/v").asText == "x")
    val (p3, _) = poll(cur2)
    assert(p3.isEmpty, "empty sweep — cursor held")
    Mongo.drop(name)
  }

  test("spanner/salesforce/spicedb pollers hold their cursors across sweeps") {
    // spanner: watermark map cursor
    val spSrv = new SpannerCdc.Server()
    try {
      val db = "projects/p/instances/i/databases/d"
      def commit(mut: String): Unit = {
        val r = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"${spSrv.baseUrl}/v1/$db/sessions/s:commit"))
            .header("Authorization", "Bearer spanner-token")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              s"""{"mutations":[$mut]}""")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() == 200, r.body())
      }
      val poll = SpannerCdc.poller(spSrv.baseUrl, "spanner-token", db, "s")
      commit("""{"insertOrUpdate":{"table":"t","columns":["k","v"],"values":[["1","a"]]}}""")
      val (s1, c1) = poll(None)
      assert(s1.size == 1 && s1.head._2("operation") == "INSERT")
      commit("""{"insertOrUpdate":{"table":"t","columns":["k","v"],"values":[["1","b"]]}}""")
      val (s2, c2) = poll(c1)
      assert(s2.size == 1 && s2.head._2("operation") == "UPDATE",
        "only the post-cursor commit")
      assert(poll(c2)._1.isEmpty)
    } finally spSrv.stop()
    // salesforce: replay-id cursor
    val auth = SalesforceCdc.Auth("tok", "https://i", "tid")
    val sfSrv = new SalesforceCdc.Server(auth)
    sfSrv.registerSchema("s1",
      """{"type":"record","name":"E","fields":[
        |{"name":"ChangeEventHeader","type":{"type":"record",
        |"name":"H","fields":[{"name":"entityName","type":"string"},
        |{"name":"changeType","type":"string"},
        |{"name":"recordIds","type":{"type":"array","items":"string"}}]}},
        |{"name":"V__c","type":"string"}]}""".stripMargin)
    try {
      val poll = SalesforceCdc.poller("127.0.0.1", sfSrv.port, auth, "/data/E")
      sfSrv.publish("/data/E", "s1", "E__c", "CREATE", "r1", """{"V__c":"a"}""")
      val (f1, rc1) = poll(None)
      assert(f1.size == 1 && f1.head._2("operation") == "CREATE")
      sfSrv.publish("/data/E", "s1", "E__c", "UPDATE", "r1", """{"V__c":"b"}""")
      val (f2, rc2) = poll(rc1)
      assert(f2.size == 1 && f2.head._2("operation") == "UPDATE")
      assert(poll(rc2)._1.isEmpty)
    } finally sfSrv.stop()
    // spicedb: zed-token cursor
    val sdSrv = new SpiceDb.Server("z-token")
    try {
      val poll = SpiceDb.poller("127.0.0.1", sdSrv.port, "z-token",
        startCursor = Some("zed-0"))
      sdSrv.publish("TOUCH", "doc", "d1", "viewer", "user", "u1")
      val (w1, zc1) = poll(None)
      assert(w1.size == 1 && w1.head._2("operation") == "TOUCH")
      sdSrv.publish("DELETE", "doc", "d1", "viewer", "user", "u1")
      val (w2, zc2) = poll(zc1)
      assert(w2.size == 1 && w2.head._2("operation") == "DELETE")
      assert(poll(zc2)._1.isEmpty)
    } finally sdSrv.stop()
  }

  test("aws_dynamodb_cdc poller: snapshot + shard records, limit bounded") {
    val name = "dcp_" + uid()
    val creds = Credentials("AKP", "SKP")
    val srv = DynamoCdc.register(name, creds)
    srv.seed("""{"N":"1"}""", Map("k" -> 1L, "v" -> "seed"))
    val poll = DynamoCdc.poller(s"mem://$name", creds, "t", limit = 3)
    val (p1, cur1) = poll(None)
    assert(p1.size == 1 && p1.head._2("operation") == "read")
    // workload: 5 inserts; limit=3 paces them across sweeps
    val client = DynamoCdc.resolveClient(s"mem://$name")
    (2 to 6).foreach { k =>
      val r = AwsApi.signedPost(client, s"mem://$name", creds, "dynamodb",
        "/", s"""{"TableName":"t","Item":{"k":{"N":"$k"},"v":{"S":"w$k"}}}""",
        Map("X-Amz-Target" -> "DynamoDB_20120810.PutItem",
          "Content-Type" -> "application/x-amz-json-1.0"))
      assert(r.status == 200)
    }
    val (p2, cur2) = poll(cur1)
    assert(p2.size == 3, "limit bounds the sweep")
    val (p3, cur3) = poll(cur2)
    assert(p3.size == 2, "next sweep drains the rest")
    assert((p2 ++ p3).map(m =>
      mapper.readTree(m._1).get("k").asLong).sorted == (2L to 6L))
    val (p4, _) = poll(cur3)
    assert(p4.isEmpty)
    DynamoCdc.drop(name)
  }
}
