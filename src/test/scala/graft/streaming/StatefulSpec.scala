package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Custom keyed-state operators over MemoryStream: state must carry
  * ACROSS micro-batches (counter keeps incrementing, cache remembers
  * the first value), and the batch analogs must agree.
  */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("running counter increments across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val out = StatefulOps.runningCounter(mem.toDF.toDF("key", "value", "ts"))
    val q = out.writeStream.format("memory").queryName("ctr")
      .outputMode("append").start()
    try {
      mem.addData(("a", "a1", ts("2021-01-01 00:00:01")),
                  ("b", "b1", ts("2021-01-01 00:00:02")),
                  ("a", "a2", ts("2021-01-01 00:00:03")))
      q.processAllAvailable()
      mem.addData(("a", "a3", ts("2021-01-01 00:01:00")),
                  ("b", "b2", ts("2021-01-01 00:01:01")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT key, value, seq FROM ctr ORDER BY key, seq")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      // batch 2's a3 continues at 3 — state survived the batch boundary
      assert(rows == Seq(
        ("a", "a1", 1L), ("a", "a2", 2L), ("a", "a3", 3L),
        ("b", "b1", 1L), ("b", "b2", 2L)))
    } finally q.stop()
  }

  test("first-value cache hydrates later messages across batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, String, Timestamp)]
    val out = StatefulOps.firstValueCache(mem.toDF.toDF("key", "value", "ts"))
    val q = out.writeStream.format("memory").queryName("fvc")
      .outputMode("append").start()
    try {
      mem.addData(("art1", "article body", ts("2021-01-01 00:00:01")))
      q.processAllAvailable()
      mem.addData(("art1", "comment A", ts("2021-01-01 00:00:10")),
                  ("art1", "comment B", ts("2021-01-01 00:00:20")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT value, cached FROM fvc ORDER BY value")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(rows == Seq(
        ("article body", "article body"),
        ("comment A", "article body"),
        ("comment B", "article body")))
    } finally q.stop()
  }

  test("batch analogs agree with streaming semantics") {
    val df = Seq(
      ("a", "a1", ts("2021-01-01 00:00:01")),
      ("a", "a2", ts("2021-01-01 00:00:03")),
      ("b", "b1", ts("2021-01-01 00:00:02"))).toDF("key", "value", "ts")
    val counted = StatefulOps.runningCounterBatch(df)
      .select("key", "value", "seq").orderBy("key", "seq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(counted == Seq(("a", "a1", 1L), ("a", "a2", 2L), ("b", "b1", 1L)))
    val cached = StatefulOps.firstValueCacheBatch(df)
      .select("value", "cached").orderBy("value")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cached == Seq(("a1", "a1"), ("a2", "a1"), ("b1", "b1")))
  }

  test("transformWithState ttlCache hydrates, expires, and re-seeds") {
    implicit val ctx = spark.sqlContext
    // transformWithState runs only on the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, String, Timestamp)]
      val out = StatefulOps.ttlCache(mem.toDF.toDF("key", "value", "ts"),
        java.time.Duration.ofSeconds(8))
      // processing-time state TTL makes the engine schedule a batch per
      // trigger regardless of data, so processAllAvailable never
      // settles — poll the sink for the expected row count instead
      val q = out.writeStream.format("memory").queryName("twscache")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .outputMode("append").start()
      def awaitRows(n: Long): Unit = {
        val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
        while (spark.table("twscache").count() < n) {
          assert(System.nanoTime() < deadline, s"timed out waiting for $n rows")
          Thread.sleep(200)
        }
      }
      try {
        mem.addData(("k", "v1", ts("2021-01-01 00:00:01")))
        awaitRows(1)
        mem.addData(("k", "v2", ts("2021-01-01 00:00:02")))
        awaitRows(2)              // within the 8 s TTL: cached = v1
        Thread.sleep(10000)       // let the TTL lapse
        mem.addData(("k", "v3", ts("2021-01-01 00:00:03")))
        awaitRows(3)              // expired: v3 re-seeds the cache
        val rows = spark.sql("SELECT value, cached FROM twscache ORDER BY value")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        assert(rows == Seq(("v1", "v1"), ("v2", "v1"), ("v3", "v3")))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("foreachBatch fan-out delivers each micro-batch to every sink") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Int]
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val cp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val q = graft.sinks.Sinks.foreachBatchFanOut(mem.toDF, cp, Seq(
      b => b.collect().foreach(r => seen.add(s"a:${r.getInt(0)}"): Unit),
      b => b.collect().foreach(r => seen.add(s"b:${r.getInt(0)}"): Unit)))
    try {
      mem.addData(1, 2)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet == Set("a:1", "a:2", "b:1", "b:2"))
    } finally q.stop()
  }
}
