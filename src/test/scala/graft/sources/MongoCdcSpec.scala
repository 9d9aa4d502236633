package graft.sources

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** mongodb_cdc contract (internal/impl/mongodb/cdc/input.go): change
  * stream events with resume tokens, snapshot-then-stream phases,
  * checkpoint resume, parallel bucket snapshot, drop/invalidate.
  */
class MongoCdcSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def fresh(): (String, Mongo.Server) = {
    val name = "cdcspec_" + java.util.UUID.randomUUID.toString.replace("-", "")
    (name, Mongo.named(name))
  }
  private def doc(k: Int, v: String) = s"""{"_id":$k,"v":"$v"}"""

  test("insert/update/delete surface as ordered change events with tokens") {
    val (name, _) = fresh()
    val c = Mongo.clientFor(s"mem://$name", "db")
    c.insert("t", Seq(mapper.readTree(doc(1, "a")), mapper.readTree(doc(2, "b"))))
    c.update("t", mapper.readTree("""{"_id":1}"""),
      mapper.readTree("""{"$set":{"v":"A"}}"""))
    c.delete("t", mapper.readTree("""{"_id":2}"""), limit = 1)
    c.close()
    val evs = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      streamSnapshot = false, startAtOperationTime = Some(1L))
      .collect().sortBy(_.seq)
    assert(evs.map(_.operation).toSeq ==
      Seq("insert", "insert", "update", "delete"))
    assert(evs.map(_.seq).toSeq == evs.map(_.seq).toSeq.sorted)
    assert(evs.map(_.token).distinct.size == 4, "tokens must be unique")
    // update carries the POST-image (update_lookup document mode)
    val up = evs.find(_.operation == "update").get
    assert(mapper.readTree(up.doc).get("v").asText == "A")
    assert(up.key == "1")
    // delete has the documentKey but no document
    val del = evs.find(_.operation == "delete").get
    assert(del.doc == null && del.key == "2")
    Mongo.drop(name)
  }

  test("snapshot then stream: first read snapshots, second resumes from checkpoint") {
    val (name, srv) = fresh()
    srv.seed("db", "t", (1 to 5).map(k => doc(k, s"v$k")))
    val ckpt = Files.createTempFile("mongocdc", ".json").toString
    val r1 = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      checkpointPath = Some(ckpt)).collect()
    assert(r1.length == 5 && r1.forall(_.operation == "read"),
      "first read = snapshot only (seed writes no oplog)")
    // workload after the checkpointed read
    val c = Mongo.clientFor(s"mem://$name", "db")
    c.insert("t", Seq(mapper.readTree(doc(6, "new"))))
    c.update("t", mapper.readTree("""{"_id":3}"""),
      mapper.readTree("""{"$set":{"v":"U"}}"""))
    c.close()
    val r2 = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      checkpointPath = Some(ckpt)).collect().sortBy(_.seq)
    assert(r2.map(_.operation).toSeq == Seq("insert", "update"),
      "resumed read must not re-snapshot or replay")
    // third read: nothing new
    val r3 = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      checkpointPath = Some(ckpt)).collect()
    assert(r3.isEmpty)
    Mongo.drop(name)
  }

  test("parallel bucket snapshot covers the collection exactly once") {
    val (name, srv) = fresh()
    srv.seed("db", "t", (1 to 97).map(k => doc(k, s"v$k")))
    val evs = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      snapshotParallelism = 4).collect()
    assert(evs.length == 97)
    val ids = evs.map(e => mapper.readTree(e.doc).get("_id").asInt).sorted
    assert(ids.toSeq == (1 to 97))
    Mongo.drop(name)
  }

  test("stream admission spills chunks beyond admitChunk (bounded driver heap)") {
    val (name, _) = fresh()
    val c = Mongo.clientFor(s"mem://$name", "db")
    (1 to 157).grouped(50).foreach(g =>
      c.insert("t", g.map(i => mapper.readTree(doc(i, s"v$i")))))
    c.close()
    val evs = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      streamSnapshot = false, startAtOperationTime = Some(1L),
      admitChunk = 40).collect()
    assert(evs.length == 157)
    assert(evs.map(_.seq).distinct.length == 157, "no loss, no dupes")
    assert(MongoCdc.lastAdmissionChunks >= 3,
      s"157 events at admitChunk=40 must spill (got " +
        s"${MongoCdc.lastAdmissionChunks} chunks)")
    // the fast path stays in memory
    MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      streamSnapshot = false, startAtOperationTime = Some(1L)).collect()
    assert(MongoCdc.lastAdmissionChunks == 1)
    Mongo.drop(name)
  }

  test("collection drop emits drop+invalidate and clears the token → re-snapshot") {
    val (name, srv) = fresh()
    srv.seed("db", "t", Seq(doc(1, "a")))
    val ckpt = Files.createTempFile("mongocdc_inv", ".json").toString
    MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      checkpointPath = Some(ckpt)).collect()
    val c = Mongo.clientFor(s"mem://$name", "db")
    c.runCommand({ val o = mapper.createObjectNode(); o.put("drop", "t"); o })
    c.insert("t", Seq(mapper.readTree(doc(9, "rebuilt"))))
    c.close()
    val r2 = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      checkpointPath = Some(ckpt)).collect().sortBy(_.seq)
    assert(r2.map(_.operation).toSeq == Seq("drop", "invalidate", "insert"))
    // token was cleared: the NEXT read snapshots the rebuilt collection
    val r3 = MongoCdc.read(spark, s"mem://$name", "db", Seq("t"),
      checkpointPath = Some(ckpt)).collect()
    assert(r3.exists(e => e.operation == "read" &&
      mapper.readTree(e.doc).get("_id").asInt == 9))
    Mongo.drop(name)
  }
}
