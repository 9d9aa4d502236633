package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Iceberg
import graft.sources.{Broker, KafkaWire}

/** Streaming soak: the full pipeline shape — Kafka WIRE source (real
  * TCP frames through the Broker.Transport seam) → JSON parse → TTL
  * dedupe → tumbling-window aggregation → Iceberg upsert sink — driven
  * for 100+ micro-batches with a MID-RUN RESTART from the checkpoint.
  * Asserts: (a) ≥100 micro-batches executed, (b) state-store size
  * stays bounded (watermark eviction works), (c) the final Iceberg
  * table equals the ground-truth aggregation — exactly-once across the
  * restart (offset resume + idempotent keyed upsert absorbs the
  * replayed batch).
  */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  test("100+ micro-batch soak with mid-run restart: bounded state, exactly-once") {
    val srv = new KafkaWire.Server()
    val hostPort = s"127.0.0.1:${srv.port}"
    val addr = s"kafka://$hostPort"
    val t = Broker.transportFor(addr)
    t.createTopic("soak", 2)
    val loc = java.nio.file.Files.createTempDirectory("soak_ice").toString
    val ck = java.nio.file.Files.createTempDirectory("soak_ck").toString
    val base = 1700000000L // epoch seconds; event i is base + i

    // ground truth: ids 0..N-1, each id%20==0 produced TWICE (dupes the
    // dedupe must drop); window = 10s tumbling on event time; cat=id%3
    val chunks = 104
    val perChunk = 10
    val total = chunks * perChunk
    def eventJson(id: Long) =
      s"""{"id":$id,"ts":${base + id},"cat":${id % 3}}"""
    def produce(ids: Range): Unit = {
      val recs = ids.flatMap { i =>
        val r = Broker.Record(i.toString.getBytes,
          eventJson(i.toLong).getBytes, timestampMs = (base + i) * 1000L)
        if (i % 20 == 0) Seq(r, r) else Seq(r) // duplicate every 20th
      }
      val (p0, p1) = recs.partition(r => new String(r.key).toLong % 2 == 0)
      if (p0.nonEmpty) t.append("soak", 0, p0)
      if (p1.nonEmpty) t.append("soak", 1, p1)
    }

    def start() = {
      val src = spark.readStream
        .format("graft.sources.BrokerSourceProvider")
        .option("address", addr).option("topic", "soak").load()
        .select(
          get_json_object($"value", "$.id").cast("long").as("id"),
          to_timestamp(get_json_object($"value", "$.ts").cast("long"))
            .as("ts"),
          get_json_object($"value", "$.cat").cast("long").as("cat"))
        .withWatermark("ts", "5 seconds")
        .dropDuplicatesWithinWatermark(Seq("id"))
      src.groupBy(window($"ts", "10 seconds"), $"cat")
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp($"window.start").as("ws"), $"cat", $"cnt")
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // merge-on-read: per-batch commit cost tracks the BATCH, not
          // the table (no rewrite) — the streaming-sink shape that
          // survives scale; the reader applies deletes by sequence, so
          // a replayed batch after restart is a no-op in effect
          if (!batch.isEmpty)
            Iceberg.upsertMergeOnRead(batch, loc, keyCols = Seq("ws", "cat"))
        }
        .start()
    }

    // session 1: 55 chunks, one forced micro-batch each
    val q1 = start()
    var maxState = 0L
    def trackState(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      Option(q.lastProgress).foreach { p =>
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        if (rows > maxState) maxState = rows
      }
    try {
      (0 until 55).foreach { c =>
        produce(c * perChunk until (c + 1) * perChunk)
        q1.processAllAvailable()
        trackState(q1)
      }
    } finally q1.stop()
    val batches1 = Option(q1.lastProgress).map(_.batchId).getOrElse(0L)

    // events arriving while the query is DOWN land on resume
    produce(550 until 560)

    // session 2: restart from the checkpoint, 48 more chunks
    val q2 = start()
    try {
      (56 until chunks).foreach { c =>
        produce(c * perChunk until (c + 1) * perChunk)
        q2.processAllAvailable()
        trackState(q2)
      }
      q2.processAllAvailable()
      val finalBatch = Option(q2.lastProgress).map(_.batchId).getOrElse(0L)
      assert(finalBatch > batches1, "batch ids continue across the restart")
      assert(finalBatch >= 100, s"soak must span 100+ micro-batches: $finalBatch")

      // bounded state: ~1200 events over 120 windows; watermark evicts
      // closed windows and expired dedupe keys, so live state is a
      // small multiple of the open tail, nowhere near the event count
      assert(maxState > 0 && maxState < total,
        s"state must stay bounded under watermark eviction: $maxState")

      // exactly-once: the Iceberg table equals the ground truth
      val expected = (0 until total).map(_.toLong)
        .groupBy(i => ((base + i) / 10 * 10, i % 3))
        .map { case ((ws, cat), ids) => (ws, cat, ids.size.toLong) }
        .toSeq.sortBy(x => (x._1, x._2))
      val got = Iceberg.readTable(spark, loc)
        .select($"ws", $"cat", $"cnt").as[(Long, Long, Long)]
        .collect().toSeq.sortBy(x => (x._1, x._2))
      assert(got == expected,
        s"exactly-once across restart: got ${got.size} rows, " +
          s"expected ${expected.size}; first diff: " +
          got.zip(expected).find(p => p._1 != p._2))
    } finally {
      q2.stop()
      KafkaWire.dropClient(hostPort)
      srv.stop()
    }
  }

  test("soak over the secured wire: SCRAM + transactional produce + read_committed, mid-run restart") {
    // the same pipeline shape as the soak above, but every r16/r17 wire
    // feature enabled at once: the broker is SASL-gated (SCRAM-SHA-256),
    // the producer wraps each chunk in a KIP-98 transaction (per-task
    // transactional_id, idempotent sequences), POISON transactions
    // abort mid-run (one while the query is DOWN), and the streaming
    // consumer reads with transaction_isolation_level: read_committed —
    // so the final table equality proves the options compose under
    // checkpoint replay: aborted data is never visible, committed data
    // exactly once.
    val srv = new KafkaWire.Server(saslUsers = Map("soak" -> "pw"))
    val hostPort = s"127.0.0.1:${srv.port}"
    val auth = "sasl_user=soak&sasl_pass=pw&sasl_mechanism=SCRAM-SHA-256"
    val prodAddr =
      s"kafka://$hostPort?transactional_id=soak&idempotent=true&$auth"
    val consAddr = s"kafka://$hostPort?isolation=read_committed&$auth"
    val t = Broker.transportFor(prodAddr)
    t.createTopic("soak2", 2)
    val loc = java.nio.file.Files.createTempDirectory("soak2_ice").toString
    val ck = java.nio.file.Files.createTempDirectory("soak2_ck").toString
    val base = 1700000000L

    val chunks = 60
    val perChunk = 10
    val total = chunks * perChunk
    def eventJson(id: Long) =
      s"""{"id":$id,"ts":${base + id},"cat":${id % 3}}"""
    // each chunk is one COMMITTED transaction per partition
    def produce(ids: Range): Unit = {
      val recs = ids.flatMap { i =>
        val r = Broker.Record(i.toString.getBytes,
          eventJson(i.toLong).getBytes, timestampMs = (base + i) * 1000L)
        if (i % 20 == 0) Seq(r, r) else Seq(r)
      }
      val (p0, p1) = recs.partition(r => new String(r.key).toLong % 2 == 0)
      if (p0.nonEmpty) t.transactional("soak2", 0) {
        t.append("soak2", 0, p0)
      }
      if (p1.nonEmpty) t.transactional("soak2", 1) {
        t.append("soak2", 1, p1)
      }
    }
    // a poison transaction: UNIQUE ids (the dedupe can't mask them)
    // with event times in the still-open tail windows (the watermark
    // can't drop them) — if a read_committed consumer ever saw one,
    // a window count would go +1 and the final equality would fail.
    // Aborted by a task death before EndTxn.
    def injectAborted(seed: Int, tsBase: Int): Unit = Seq(0, 1).foreach { p =>
      try t.transactional("soak2", p) {
        t.append("soak2", p, (0 until 5).map { i =>
          val tsid = (tsBase + 2 + i).toLong
          val pid = 100000L + seed.toLong * 10 + i
          Broker.Record(s"poison$seed$i".getBytes,
            s"""{"id":$pid,"ts":${base + tsid},"cat":${tsid % 3}}"""
              .getBytes,
            timestampMs = (base + tsid) * 1000L)
        })
        throw new RuntimeException("poison abort")
      } catch {
        case e: RuntimeException if e.getMessage == "poison abort" =>
      }
    }

    def start() = {
      val src = spark.readStream
        .format("graft.sources.BrokerSourceProvider")
        .option("address", consAddr).option("topic", "soak2").load()
        .select(
          get_json_object($"value", "$.id").cast("long").as("id"),
          to_timestamp(get_json_object($"value", "$.ts").cast("long"))
            .as("ts"),
          get_json_object($"value", "$.cat").cast("long").as("cat"))
        .withWatermark("ts", "5 seconds")
        .dropDuplicatesWithinWatermark(Seq("id"))
      src.groupBy(window($"ts", "10 seconds"), $"cat")
        .agg(count(lit(1)).as("cnt"))
        .select(unix_timestamp($"window.start").as("ws"), $"cat", $"cnt")
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty)
            Iceberg.upsertMergeOnRead(batch, loc, keyCols = Seq("ws", "cat"))
        }
        .start()
    }

    // session 1: 30 committed chunks with periodic poison aborts
    val q1 = start()
    try {
      (0 until 30).foreach { c =>
        produce(c * perChunk until (c + 1) * perChunk)
        if (c % 7 == 3) injectAborted(c * 31, c * perChunk)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    val batches1 = Option(q1.lastProgress).map(_.batchId).getOrElse(0L)

    // while the query is DOWN: committed events AND a poison abort —
    // the resume replays from the checkpointed offsets over both
    produce(300 until 310)
    injectAborted(977, 300)

    // session 2: restart from the checkpoint, the rest of the chunks
    val q2 = start()
    try {
      (31 until chunks).foreach { c =>
        produce(c * perChunk until (c + 1) * perChunk)
        if (c % 9 == 5) injectAborted(c * 53, c * perChunk)
        q2.processAllAvailable()
      }
      q2.processAllAvailable()
      val finalBatch = Option(q2.lastProgress).map(_.batchId).getOrElse(0L)
      assert(finalBatch > batches1, "batch ids continue across the restart")

      // the table equals the ground truth computed from COMMITTED
      // events only — any poison row visible anywhere (live tail,
      // restart replay, down-time segment) would break a window count
      val expected = (0 until total).map(_.toLong)
        .groupBy(i => ((base + i) / 10 * 10, i % 3))
        .map { case ((ws, cat), ids) => (ws, cat, ids.size.toLong) }
        .toSeq.sortBy(x => (x._1, x._2))
      val got = Iceberg.readTable(spark, loc)
        .select($"ws", $"cat", $"cnt").as[(Long, Long, Long)]
        .collect().toSeq.sortBy(x => (x._1, x._2))
      assert(got == expected,
        s"secured-wire exactly-once across restart: got ${got.size} rows, " +
          s"expected ${expected.size}; first diff: " +
          got.zip(expected).find(p => p._1 != p._2))
    } finally {
      q2.stop()
      KafkaWire.dropClient(s"$hostPort?transactional_id=soak&idempotent=true&$auth")
      KafkaWire.dropClient(s"$hostPort?isolation=read_committed&$auth")
      srv.stop()
    }
  }
}
