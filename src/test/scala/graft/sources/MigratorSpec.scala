package graft.sources

import graft.SparkSpec
import graft.sources.SchemaRegistryIO.InMemoryServer

/** redpanda_migrator contract (internal/impl/redpanda/migrator):
  * topic creation, order-preserving data copy with schema-id
  * translation, consumer-group offset translation, ACL sync.
  */
class MigratorSpec extends SparkSpec {

  private def uid() = java.util.UUID.randomUUID.toString.replace("-", "")

  private def confluentFrame(id: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + payload.length)
    java.nio.ByteBuffer.wrap(out).put(0.toByte).putInt(id)
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  test("schema ids are re-registered and rewritten inside the copied records") {
    val (sn, dn) = ("mig_src_" + uid(), "mig_dst_" + uid())
    val src = Broker.InMemory.named(sn)
    val dst = Broker.InMemory.named(dn)
    src.createTopic("events", 2)
    // source registry: two subjects; ids 7 and 9
    val srcReg = InMemoryServer.Transport(Seq(
      InMemoryServer.Entry("events-value", 1, 7, """{"type":"string"}"""),
      InMemoryServer.Entry("other-value", 1, 9, """{"type":"long"}""")))
    // destination registry already holds an unrelated schema, so the
    // assigned ids differ from the source's
    val dstReg = InMemoryServer.Transport(Seq(
      InMemoryServer.Entry("pre-existing", 1, 100, """{"type":"int"}""")))
    src.append("events", 0, Seq(
      Broker.Record("k1".getBytes, confluentFrame(7, "v1".getBytes)),
      Broker.Record("k2".getBytes, "plain".getBytes))) // unframed survives
    src.append("events", 1, Seq(
      Broker.Record(null, confluentFrame(9, "v9".getBytes))))
    val report = Migrator.migrate(spark, s"mem://$sn", s"mem://$dn",
      srcRegistry = srcReg, dstRegistry = dstReg)
    assert(report.topics == 1 && report.records == 3L && report.schemas == 2)
    // destination ids start after the pre-existing 100
    val id7 = java.nio.ByteBuffer.wrap(
      dst.fetch("events", 0, 0, 10).next().value, 1, 4).getInt
    assert(id7 == 101, s"source id 7 must map to the destination's id (got $id7)")
    val p0 = dst.fetch("events", 0, 0, 10).toVector
    assert(new String(p0(1).value) == "plain", "unframed values untouched")
    val p1 = dst.fetch("events", 1, 0, 10).toVector
    assert(java.nio.ByteBuffer.wrap(p1.head.value, 1, 4).getInt == 102)
    Broker.InMemory.drop(sn); Broker.InMemory.drop(dn)
  }

  test("consumer group offsets translate exactly; order and metadata survive") {
    val (sn, dn) = ("mig_src_" + uid(), "mig_dst_" + uid())
    val src = Broker.InMemory.named(sn)
    val dst = Broker.InMemory.named(dn)
    src.createTopic("t", 3)
    (0 until 3).foreach { p =>
      src.append("t", p, (0 until 50).map(i =>
        Broker.Record(s"k$p-$i".getBytes, s"v$p-$i".getBytes,
          Map("h" -> s"$p-$i"), timestampMs = 1000L + i)))
    }
    src.commitGroupOffset("analytics", "t", 0, 17L)
    src.commitGroupOffset("analytics", "t", 2, 50L) // fully caught up
    src.commitGroupOffset("audit", "t", 1, 5L)
    val report = Migrator.migrate(spark, s"mem://$sn", s"mem://$dn")
    assert(report.records == 150L && report.groups == 2)
    assert(dst.committedOffsets("analytics") ==
      Seq(("t", 0, 17L), ("t", 2, 50L)))
    assert(dst.committedOffsets("audit") == Seq(("t", 1, 5L)))
    // copy preserved order, headers, timestamps
    val got = dst.fetch("t", 1, 0, 100).toVector
    assert(got.size == 50)
    assert(got(7).headers("h") == "1-7" && got(7).timestampMs == 1007L)
    assert(new String(got(7).key) == "k1-7")
    Broker.InMemory.drop(sn); Broker.InMemory.drop(dn)
  }

  test("acls sync for migrated topics; topic selection filters") {
    val (sn, dn) = ("mig_src_" + uid(), "mig_dst_" + uid())
    val src = Broker.InMemory.named(sn)
    val dst = Broker.InMemory.named(dn)
    src.createTopic("keep", 1); src.createTopic("skip", 1)
    src.append("keep", 0, Seq(Broker.Record(null, "a".getBytes)))
    src.append("skip", 0, Seq(Broker.Record(null, "b".getBytes)))
    src.createAcl("User:svc", "READ", "keep")
    src.createAcl("User:svc", "WRITE", "skip")
    src.createAcl("User:all", "READ", "*")
    val report = Migrator.migrate(spark, s"mem://$sn", s"mem://$dn",
      topics = Seq("keep"))
    assert(report.topics == 1 && report.records == 1L && report.acls == 2)
    assert(dst.listAcls().toSet ==
      Set(("User:svc", "READ", "keep"), ("User:all", "READ", "*")))
    intercept[IllegalArgumentException] { dst.partitionCount("skip") }
    Broker.InMemory.drop(sn); Broker.InMemory.drop(dn)
  }
}
