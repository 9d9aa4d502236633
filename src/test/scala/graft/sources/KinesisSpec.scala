package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Kinesis shard-model contracts through the [[Kinesis]] seam:
  * MD5 hash-range routing, per-shard sequence order, checkpoint-table
  * resume (at-least-once, commit-after-delivery), explicit shard
  * selection, and TRIM_HORIZON vs LATEST starts.
  */
class KinesisSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "kin_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("putRecord routes by MD5 hash range: deterministic per key, " +
       "spread across shards") {
    val t = Kinesis.named(fresh())
    t.createStream("s", 4)
    val keys = (0 until 200).map(i => s"key-$i")
    val assigned = keys.map(k => k -> t.putRecord("s", k, k.getBytes)._1)
    // deterministic: a re-put of the same key lands on the same shard
    assigned.take(20).foreach { case (k, shard) =>
      assert(t.putRecord("s", k, k.getBytes)._1 == shard)
    }
    // matches the documented range math exactly
    assigned.foreach { case (k, shard) =>
      assert(shard == Kinesis.shardForKey(k, 4))
    }
    val byShard = assigned.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byShard.keySet.size == 4, s"MD5 spread uses all shards: $byShard")
  }

  test("per-shard sequences are monotone and scans are ordered") {
    val t = Kinesis.named(fresh())
    t.createStream("s", 2)
    (0 until 50).foreach(i => t.putRecord("s", s"k$i", s"v$i".getBytes))
    (0 until 2).foreach { shard =>
      val recs = t.getRecords("s", shard, 0L,
        t.latestSequence("s", shard)).toVector
      assert(recs.map(_.sequence) == (1L to recs.size.toLong),
        "gapless per-shard sequences")
    }
  }

  test("read resumes each shard from the checkpoint table; " +
       "commit happens after materialization") {
    val name = fresh()
    val t = Kinesis.named(name)
    t.createStream("s", 3)
    (0 until 60).foreach(i =>
      t.putRecord("s", s"k$i", s"""{"i":$i}""".getBytes))
    val store = new Cursors.MemStore
    val r1 = Kinesis.read(spark, s"mem://$name", Seq("s"),
      checkpoint = Some((store, "ckpt")))
    assert(r1.count() == 60)
    // no new data: second read is empty (sequences came from the table)
    assert(Kinesis.read(spark, s"mem://$name", Seq("s"),
      checkpoint = Some((store, "ckpt"))).count() == 0)
    (60 until 90).foreach(i =>
      t.putRecord("s", s"k$i", s"""{"i":$i}""".getBytes))
    val r3 = Kinesis.read(spark, s"mem://$name", Seq("s"),
      checkpoint = Some((store, "ckpt")))
    val ids = r3.select(get_json_object($"value", "$.i").cast("int"))
      .as[Int].collect().toSeq.sorted
    assert(ids == (60 until 90), "resume reads exactly the new tail")
  }

  test("explicit shard selection 'name:i' reads only that shard") {
    val name = fresh()
    val t = Kinesis.named(name)
    t.createStream("s", 4)
    val keys = (0 until 80).map(i => s"k$i")
    keys.foreach(k => t.putRecord("s", k, k.getBytes))
    val only2 = Kinesis.read(spark, s"mem://$name", Seq("s:2"))
      .select($"metadata"("kinesis_shard").as("sh"),
        $"metadata"("kinesis_partition_key").as("pk")).collect()
    val expect = keys.filter(Kinesis.shardForKey(_, 4) == 2)
    assert(only2.length == expect.size)
    assert(only2.forall(_.getString(0) == "2"))
    assert(only2.map(_.getString(1)).sorted.toSeq == expect.sorted)
  }

  test("start_from_oldest=false begins at LATEST for unseen shards") {
    val name = fresh()
    val t = Kinesis.named(name)
    t.createStream("s", 2)
    (0 until 20).foreach(i => t.putRecord("s", s"k$i", "old".getBytes))
    val store = new Cursors.MemStore
    assert(Kinesis.read(spark, s"mem://$name", Seq("s"),
      checkpoint = Some((store, "ck")), startFromOldest = false)
      .count() == 0, "LATEST skips the existing backlog")
    (20 until 30).foreach(i => t.putRecord("s", s"k$i", "new".getBytes))
    val r = Kinesis.read(spark, s"mem://$name", Seq("s"),
      checkpoint = Some((store, "ck")), startFromOldest = false)
    assert(r.count() == 10, "but picks up everything after the first read")
  }

  test("spark roundtrip surfaces the kinesis_* metadata") {
    val name = fresh()
    val t = Kinesis.named(name)
    t.createStream("s", 4)
    val df = (1 to 100).map(i => (s"""{"i":$i}""", s"pk${i % 10}"))
      .toDF("value", "pk")
    Kinesis.write(df, s"mem://$name", "s", "pk")
    val got = Kinesis.read(spark, s"mem://$name", Seq("s")).select(
      get_json_object($"value", "$.i").cast("int").as("i"),
      $"metadata"("kinesis_stream").as("st"),
      $"metadata"("kinesis_shard").cast("int").as("sh"),
      $"metadata"("kinesis_partition_key").as("pk"),
      $"metadata"("kinesis_sequence_number").cast("long").as("seq"))
      .collect()
    assert(got.length == 100)
    assert(got.map(_.getInt(0)).sorted.toSeq == (1 to 100))
    assert(got.forall(_.getString(1) == "s"))
    assert(got.forall(r =>
      r.getInt(2) == Kinesis.shardForKey(r.getString(3), 4)))
  }
}
