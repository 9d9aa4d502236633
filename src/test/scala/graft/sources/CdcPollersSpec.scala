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
