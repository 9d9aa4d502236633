package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pulsar contract over the broker seam: JavaStringHash key routing,
  * pulsar_* metadata, config-runner round-trip.
  */
class PulsarSpec extends SparkSpec {
  import spark.implicits._

  test("java_hash partitioner matches pulsar's JavaStringHash router") {
    Seq("a", "key-1", "ordering", "日本語").foreach { k =>
      assert(Broker.partitionFor("java_hash", k.getBytes("UTF-8"), 7) ==
        (k.hashCode & 0x7fffffff) % 7, s"key $k")
    }
  }

  test("config runner: pulsar output → input round-trip with metadata") {
    val addr = "mem://pl_" + java.util.UUID.randomUUID.toString.replace("-", "")
    graft.config.Pipeline.run(spark,
      s"""input:
         |  generate: { count: 12, mapping: 'root.id = this.seq' }
         |output:
         |  pulsar:
         |    url: "$addr"
         |    topic: events
         |    key: 'k$${! this.id % 3 }'
         |""".stripMargin)
    graft.config.Pipeline.run(spark,
      s"""input:
         |  pulsar: { url: "$addr", topics: [ events ] }
         |pipeline:
         |  processors:
         |    - mapping: 'root.id = this.id
         |root.key = meta("pulsar_key")
         |root.mid = meta("pulsar_message_id")
         |root.topic = meta("pulsar_topic")'
         |output: { memory: { name: pl_rt } }
         |""".stripMargin)
    val got = spark.table("pl_rt").select(
        get_json_object($"value", "$.id").cast("long").as("id"),
        get_json_object($"value", "$.key").as("key"),
        get_json_object($"value", "$.mid").as("mid"),
        get_json_object($"value", "$.topic").as("topic"))
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == (0L until 12L))
    assert(got.forall(r => r._2 == s"k${r._1 % 3}"))
    assert(got.forall(_._4 == "events"))
    // same key → same partition (message id prefix), offsets ascending
    // in publish order within each key
    val byKey = got.groupBy(_._2)
    byKey.values.foreach { rows =>
      val parts = rows.map(_._3.split(":")(0)).distinct
      assert(parts.size == 1, s"key split across partitions: $rows")
      val offs = rows.sortBy(_._1).map(_._3.split(":")(1).toLong)
      assert(offs == offs.sorted, "per-key publish order preserved")
    }
  }
}
