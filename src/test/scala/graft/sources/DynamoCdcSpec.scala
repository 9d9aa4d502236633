package graft.sources

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import graft.operators.Http
import graft.sources.S3.Credentials
import graft.SparkSpec

/** aws_dynamodb_cdc contract (internal/impl/aws/dynamodb/input_cdc.go):
  * segmented snapshot, INSERT/MODIFY/REMOVE stream records, shard
  * lineage across re-sharding, per-shard checkpoint resume, SigV4.
  */
class DynamoCdcSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val creds = Credentials("AKTEST", "SKTEST")

  private def fresh(): (String, DynamoCdc.MemDynamoStreams) = {
    val name = "ddb_" + java.util.UUID.randomUUID.toString.replace("-", "")
    (name, DynamoCdc.register(name, creds))
  }

  private def put(name: String, k: Long, v: String): Unit =
    mutate(name, "DynamoDB_20120810.PutItem",
      s"""{"TableName":"t","Item":{"k":{"N":"$k"},"v":{"S":"$v"}}}""")
  private def del(name: String, k: Long): Unit =
    mutate(name, "DynamoDB_20120810.DeleteItem",
      s"""{"TableName":"t","Key":{"k":{"N":"$k"}}}""")
  private def upd(name: String, k: Long, v: String): Unit =
    mutate(name, "DynamoDB_20120810.UpdateItem",
      s"""{"TableName":"t","Key":{"k":{"N":"$k"}},"AttributeUpdates":{"v":{"Action":"PUT","Value":{"S":"$v"}}}}""")
  private def mutate(name: String, target: String, body: String): Unit = {
    val r = AwsApi.signedPost(DynamoCdc.resolveClient(s"mem://$name"),
      s"mem://$name", creds, "dynamodb", "/", body,
      Map("X-Amz-Target" -> target,
        "Content-Type" -> "application/x-amz-json-1.0"))
    assert(r.status == 200, s"$target: ${r.body}")
  }

  test("insert/modify/remove stream records carry keys and both images") {
    val (name, _) = fresh()
    put(name, 1, "a"); upd(name, 1, "A"); del(name, 1)
    val evs = DynamoCdc.read(spark, s"mem://$name", creds, "t",
      streamSnapshot = false).collect().sortBy(_.seq)
    assert(evs.map(_.operation).toSeq == Seq("INSERT", "MODIFY", "REMOVE"))
    assert(mapper.readTree(evs(0).newImage).get("v").asText == "a")
    val mod = evs(1)
    assert(mapper.readTree(mod.newImage).get("v").asText == "A")
    assert(mapper.readTree(mod.oldImage).get("v").asText == "a")
    val rem = evs(2)
    assert(rem.newImage == null &&
      mapper.readTree(rem.oldImage).get("v").asText == "A")
    assert(mapper.readTree(rem.keys).get("k").asLong == 1L)
    DynamoCdc.drop(name)
  }

  test("segmented snapshot covers seeded items exactly once") {
    val (name, srv) = fresh()
    (1 to 57).foreach(i => srv.seed(s"""{"N":"$i"}""",
      Map("k" -> i.toLong, "v" -> s"v$i")))
    val evs = DynamoCdc.read(spark, s"mem://$name", creds, "t",
      snapshotSegments = 4).collect()
    assert(evs.length == 57 && evs.forall(_.operation == "read"))
    val ks = evs.map(e => mapper.readTree(e.newImage).get("k").asInt).sorted
    assert(ks.toSeq == (1 to 57))
    DynamoCdc.drop(name)
  }

  test("checkpoint resume: second read returns only post-checkpoint records") {
    val (name, srv) = fresh()
    srv.seed("""{"N":"1"}""", Map("k" -> 1L, "v" -> "seed"))
    val ck = Files.createTempFile("ddbcdc", ".json").toString
    val r1 = DynamoCdc.read(spark, s"mem://$name", creds, "t",
      checkpointPath = Some(ck)).collect()
    assert(r1.length == 1 && r1.head.operation == "read")
    put(name, 2, "b"); put(name, 3, "c")
    val r2 = DynamoCdc.read(spark, s"mem://$name", creds, "t",
      checkpointPath = Some(ck)).collect().sortBy(_.seq)
    assert(r2.map(_.operation).toSeq == Seq("INSERT", "INSERT"),
      "no re-snapshot, no replay")
    val r3 = DynamoCdc.read(spark, s"mem://$name", creds, "t",
      checkpointPath = Some(ck)).collect()
    assert(r3.isEmpty)
    DynamoCdc.drop(name)
  }

  test("shard lineage: parent records surface before child records") {
    val (name, srv) = fresh()
    (1 to 10).foreach(i => put(name, i, s"p$i"))
    srv.rotateShards(2)
    (11 to 20).foreach(i => put(name, i, s"c$i"))
    val evs = DynamoCdc.read(spark, s"mem://$name", creds, "t",
      streamSnapshot = false).collect()
    // every parent-shard record must carry a lower sequence than every
    // child-shard record, and all 20 arrive exactly once
    val (parents, children) = evs.partition(_.shard == "shardId-0000")
    assert(parents.size == 10 && children.size == 10)
    assert(parents.map(_.seq).max < children.map(_.seq).min)
    assert(children.map(_.shard).distinct.forall(_.startsWith("shardId-0000-c")))
    DynamoCdc.drop(name)
  }

  test("a bad secret is rejected by server-side SigV4 re-derivation") {
    val (name, srv) = fresh()
    intercept[IllegalStateException] {
      DynamoCdc.read(spark, s"mem://$name", Credentials("AKTEST", "WRONG"),
        "t", streamSnapshot = false).collect()
    }
    assert(srv.rejected > 0)
    DynamoCdc.drop(name)
  }
  test("global-table checkpoints survive a regional failover (time-based resume)") {
    // two regions, each with its own stream (distinct shards/sequence
    // numbers) over the same logical source; the checkpoint table is a
    // Global Table v2, so the failed-over region resumes time-based
    // (inputs/aws_dynamodb_cdc.adoc:144,178)
    @volatile var nowMs = 10_000L
    val clk = () => nowMs
    val eastName = "ddbge_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val westName = "ddbgw_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val east = DynamoCdc.register(eastName, creds, "k", clk)
    val west = DynamoCdc.register(westName, creds, "k", clk)
    east.linkRegion("us-west-2", west)
    west.linkRegion("us-east-1", east)
    def putBoth(k: Long, v: String): Unit = {
      put(eastName, k, v); put(westName, k, v)
    }

    putBoth(1, "a1"); putBoth(2, "a2") // ancient history, t=10s
    val eastStore = new DynamoCdc.DynamoCkptStore(s"mem://$eastName", creds,
      "ckpts", "t", globalTable = true, replicas = Seq("us-west-2"))
    val r1 = DynamoCdc.read(spark, s"mem://$eastName", creds, "t",
      checkpoint = Some(eastStore)).collect()
    assert(r1.count(_.operation == "INSERT") == 2)

    nowMs = 1_000_000L
    putBoth(3, "b1")
    val r2 = DynamoCdc.read(spark, s"mem://$eastName", creds, "t",
      checkpoint = Some(eastStore)).collect()
    assert(r2.map(e => mapper.readTree(e.newImage).get("v").asText).toSet ==
      Set("b1"), "seq-based same-region resume")

    // checkpoint replicated into the west region's table
    assert(west.genItem("ckpts", "t").isDefined,
      "checkpoint row did not replicate to the replica region")

    nowMs = 2_000_000L
    putBoth(4, "c1")
    // FAILOVER: the west region consumes with the replicated checkpoint.
    // Its shard ids are foreign, so resume is time-based: the ancient
    // records are skipped, the boundary-time record (b1) may replay,
    // c1 must arrive, and no snapshot re-runs.
    val westStore = new DynamoCdc.DynamoCkptStore(s"mem://$westName", creds,
      "ckpts", "t", globalTable = true, replicas = Seq("us-east-1"))
    val r3 = DynamoCdc.read(spark, s"mem://$westName", creds, "t",
      checkpoint = Some(westStore)).collect()
    assert(!r3.exists(_.operation == "read"), "snapshot must not re-run")
    val vals = r3.map(e => mapper.readTree(e.newImage).get("v").asText).toSet
    assert(vals.contains("c1"), s"new record missing: $vals")
    assert(!vals.contains("a1") && !vals.contains("a2"),
      s"ancient records replayed (full-stream replay): $vals")
    // and the pre-existing-non-global guard fails fast
    val plainName = "ddbgp_" + java.util.UUID.randomUUID.toString.replace("-", "")
    DynamoCdc.register(plainName, creds, "k", clk)
    mutate(plainName, "DynamoDB_20120810.CreateTable",
      """{"TableName":"ckpts","KeySchema":[{"AttributeName":"Other","KeyType":"HASH"}],"AttributeDefinitions":[]}""")
    val e = intercept[IllegalArgumentException] {
      new DynamoCdc.DynamoCkptStore(s"mem://$plainName", creds,
        "ckpts", "t", globalTable = true, replicas = Seq("us-west-2"))
    }
    assert(e.getMessage.contains("global mode"))
  }

}
