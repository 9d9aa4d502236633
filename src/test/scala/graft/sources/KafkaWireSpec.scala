package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec

/** The hand-rolled Kafka binary protocol (KafkaWire.scala): record-batch
  * v2 codec, produce/fetch over real TCP, server-side CRC validation,
  * the consumer-group state machine (join barrier, generations,
  * rebalance errors), and offset commit/resume.
  */
class KafkaWireSpec extends SparkSpec {

  private def withServer[T](f: KafkaWire.Server => T): T = {
    val srv = new KafkaWire.Server(joinDelayMs = 80)
    try f(srv) finally srv.stop()
  }

  test("record batch v2: roundtrip with headers, null key, tombstone") {
    val recs = Seq(
      Broker.Stored(0, 7L, "k1".getBytes, "v1".getBytes,
        Map("h1" -> "a", "h2" -> null), 1000L),
      Broker.Stored(0, 8L, null, "v2".getBytes, Map.empty, 1005L),
      Broker.Stored(0, 9L, "k3".getBytes, null, Map.empty, 990L))
    val bytes = KafkaWire.encodeBatch(recs)
    val back = KafkaWire.decodeBatches(bytes, 0, assignFrom = None)
    assert(back.map(_.offset) == Seq(7L, 8L, 9L))
    assert(back.map(_.timestampMs) == Seq(1000L, 1005L, 990L))
    assert(new String(back.head.key) == "k1")
    assert(back.head.headers == Map("h1" -> "a", "h2" -> null))
    assert(back(1).key == null)
    assert(back(2).value == null) // tombstone survives the wire
  }

  test("record batch v2: corrupted payload fails CRC32C") {
    val bytes = KafkaWire.encodeBatch(Seq(
      Broker.Stored(0, 0L, "k".getBytes, "value".getBytes, Map.empty, 1L)))
    bytes(bytes.length - 3) = (bytes(bytes.length - 3) ^ 0x40).toByte
    intercept[KafkaWire.CorruptBatch] {
      KafkaWire.decodeBatches(bytes, 0, assignFrom = None)
    }
  }

  test("produce → fetch roundtrip over real TCP frames") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("t", 3)
        assert(c.partitionCount("t") == 3)
        assert(c.apiVersions().contains(0)) // Produce advertised
        val base = c.append("t", 1, (0 until 1200).map { i =>
          Broker.Record(s"k$i".getBytes, s"v$i".getBytes,
            Map("n" -> i.toString), timestampMs = 5000L + i)
        })
        assert(base == 0L)
        assert(c.endOffset("t", 1) == 1200L)
        assert(c.endOffset("t", 0) == 0L)
        // paged fetch (server caps 500 records/response → 3 pages)
        val got = c.fetch("t", 1, 0L, 1200L).toVector
        assert(got.size == 1200)
        assert(got.map(_.offset) == (0L until 1200L).toVector)
        assert(new String(got(42).value) == "v42")
        assert(got(42).headers == Map("n" -> "42"))
        assert(got(42).timestampMs == 5042L)
        // bounded + offset-resumed fetch
        val tail = c.fetch("t", 1, 1190L, 1195L).toVector
        assert(tail.map(_.offset) == (1190L until 1195L).toVector)
      } finally c.close()
    }
  }

  test("server rejects unknown topics and CRC-corrupt produce") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        val e = intercept[KafkaWire.WireError] {
          c.append("nope", 0, Seq(Broker.Record("k".getBytes, "v".getBytes)))
        }
        assert(e.code == KafkaWire.ErrUnknownTopicOrPartition)
        intercept[KafkaWire.WireError] { c.partitionCount("nope") }
      } finally c.close()
    }
  }

  test("consumer group: two members join through the barrier, range-assigned") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      c.createTopic("events", 4)
      c.close()
      val m1 = new KafkaWire.GroupMember("127.0.0.1", srv.port, "g1", Seq("events"))
      val m2 = new KafkaWire.GroupMember("127.0.0.1", srv.port, "g1", Seq("events"))
      try {
        val pool = Executors.newFixedThreadPool(2)
        val start = new CountDownLatch(1)
        val f1 = pool.submit(() => { start.await(); m1.join() })
        val f2 = pool.submit(() => { start.await(); m2.join() })
        start.countDown()
        val a1 = f1.get(15, TimeUnit.SECONDS)
        val a2 = f2.get(15, TimeUnit.SECONDS)
        pool.shutdown()
        // same generation, disjoint assignment covering all 4 partitions
        assert(m1.generation == m2.generation)
        val all = a1.getOrElse("events", Nil) ++ a2.getOrElse("events", Nil)
        assert(all.sorted == Seq(0, 1, 2, 3))
        assert(a1.getOrElse("events", Nil)
          .intersect(a2.getOrElse("events", Nil)).isEmpty)
        assert(m1.heartbeat() == KafkaWire.ErrNone)
        assert(m2.heartbeat() == KafkaWire.ErrNone)
      } finally { m1.close(); m2.close() }
    }
  }

  test("consumer group: leave triggers rebalance; rejoin bumps generation") {
    withServer { srv =>
      val admin = new KafkaWire.Client("127.0.0.1", srv.port)
      admin.createTopic("logs", 2)
      admin.close()
      val m = new KafkaWire.GroupMember("127.0.0.1", srv.port, "g2", Seq("logs"))
      try {
        val a1 = m.join()
        val gen1 = m.generation
        assert(a1("logs").sorted == Seq(0, 1)) // sole member owns both
        m.commit(Map(("logs", 0) -> 17L, ("logs", 1) -> 3L))
        assert(m.committed() == Map(("logs", 0) -> 17L, ("logs", 1) -> 3L))
        m.leave()
        val a2 = m.join()
        assert(m.generation > gen1) // new generation after the rebalance
        assert(a2("logs").sorted == Seq(0, 1))
        // committed offsets survive the rebalance — the resume point
        assert(m.committed() == Map(("logs", 0) -> 17L, ("logs", 1) -> 3L))
      } finally m.close()
    }
  }

  test("heartbeat with a stale generation fails ILLEGAL_GENERATION") {
    withServer { srv =>
      val admin = new KafkaWire.Client("127.0.0.1", srv.port)
      admin.createTopic("x", 1)
      val m = new KafkaWire.GroupMember("127.0.0.1", srv.port, "g3", Seq("x"))
      try {
        m.join()
        // a second session rejoins under the same member protocol,
        // bumping the generation; the old session's heartbeat now fails
        val gen = m.generation
        m.leave(); m.join()
        assert(m.generation > gen)
        assert(m.heartbeat() == KafkaWire.ErrNone)
        assert(admin.heartbeat("g3", gen, "graft-999") ==
          KafkaWire.ErrUnknownMemberId)
      } finally { m.close(); admin.close() }
    }
  }

  test("Broker.transportFor resolves kafka:// to the wire client") {
    withServer { srv =>
      val addr = s"kafka://127.0.0.1:${srv.port}"
      val t = Broker.transportFor(addr)
      t.createTopic("via-seam", 2)
      t.append("via-seam", 0, Seq(Broker.Record("a".getBytes, "1".getBytes)))
      t.append("via-seam", 1, Seq(Broker.Record("b".getBytes, "2".getBytes)))
      assert(t.partitionCount("via-seam") == 2)
      assert(t.endOffset("via-seam", 0) == 1L)
      assert(t.listTopics().contains("via-seam"))
      val got = t.fetch("via-seam", 1, 0L, 1L).toVector
      assert(new String(got.head.value) == "2")
      // simple (non-group-session) offset commit path
      t.commitGroupOffset("simple", "via-seam", 0, 1L)
      assert(t.committedOffsets("simple") == Seq(("via-seam", 0, 1L)))
      KafkaWire.dropClient(s"127.0.0.1:${srv.port}")
    }
  }

  test("brokerWrite/brokerRead run unchanged over the wire transport") {
    withServer { srv =>
      import org.apache.spark.sql.functions._
      val addr = s"kafka://127.0.0.1:${srv.port}"
      Broker.transportFor(addr).createTopic("docs", 3)
      val df = spark.range(0, 90).select(
        col("id"), concat(lit("body-"), col("id")).as("text"))
      graft.sinks.Sinks.brokerWrite(df, addr, "docs",
        col("id"), col("text"), col("id"))
      val back = Sources.brokerRead(spark, addr, "docs")
      assert(back.count() == 90)
      val row = back.filter(col("metadata")("kafka_key") === "41")
        .collect().head
      assert(row.getString(0) == "body-41")
      // fnv1a partition assignment is the same one computed locally
      val expectedPart = Broker.partitionFor("fnv1a_hash", "41".getBytes, 3)
      assert(row.getMap[String, String](1)("kafka_partition") ==
        expectedPart.toString)
      KafkaWire.dropClient(s"127.0.0.1:${srv.port}")
    }
  }

  test("record batch v2: every codec roundtrips; attributes carry the id") {
    val recs = (0 until 200).map { i =>
      Broker.Stored(0, i.toLong, s"k$i".getBytes,
        (s"v$i" * 20).getBytes, Map("h" -> i.toString), 1000L + i)
    }
    for (codec <- Seq(KafkaWire.CodecGzip, KafkaWire.CodecSnappy,
                      KafkaWire.CodecLz4, KafkaWire.CodecZstd)) {
      val bytes = KafkaWire.encodeBatch(recs, codec)
      // attributes int16 sits at bytes 21-22 (after offset+len+epoch+magic+crc);
      // the codec id is in the low byte of the big-endian value
      assert((bytes(22) & 7) == codec, "attributes bits 0-2 carry the codec")
      val plain = KafkaWire.encodeBatch(recs)
      assert(bytes.length < plain.length, s"codec $codec should shrink 200 records")
      val back = KafkaWire.decodeBatches(bytes, 0, assignFrom = None)
      assert(back.map(_.offset) == recs.map(_.offset))
      assert(back.map(r => new String(r.value)) == recs.map(r => new String(r.value)))
      assert(back.map(_.headers) == recs.map(_.headers))
    }
  }

  test("compressed produce → compressed fetch over real TCP frames") {
    // producer sends zstd batches (CRC over the compressed wire bytes —
    // validated server-side), broker re-serves gzip per its own
    // compression.type, client transparently decompresses
    val srv = new KafkaWire.Server(joinDelayMs = 80,
      fetchCodec = KafkaWire.CodecGzip)
    try {
      val c = new KafkaWire.Client("127.0.0.1", srv.port,
        produceCodec = KafkaWire.CodecZstd)
      try {
        c.createTopic("cz", 1)
        c.append("cz", 0, (0 until 700).map { i =>
          Broker.Record(s"k$i".getBytes, s"payload-$i".getBytes,
            Map.empty, timestampMs = 1L + i)
        })
        val got = c.fetch("cz", 0, 0L, 700L).toVector
        assert(got.size == 700)
        assert(new String(got(699).value) == "payload-699")
      } finally c.close()
    } finally srv.stop()
  }

  test("flexible generation: Produce v9 → Fetch v13 (topic ids, tagged fields)") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port, protocol = "flexible")
      try {
        c.createTopic("flex", 2)
        val base = c.append("flex", 1, (0 until 1100).map { i =>
          Broker.Record(s"k$i".getBytes, s"v$i".getBytes,
            Map("n" -> i.toString), timestampMs = 100L + i)
        })
        assert(base == 0L)
        // v13 fetch pages through by KIP-516 topic id (Metadata v12)
        val got = c.fetch("flex", 1, 0L, 1100L).toVector
        assert(got.size == 1100)
        assert(got.map(_.offset) == (0L until 1100L).toVector)
        assert(new String(got(77).value) == "v77")
        assert(got(77).headers == Map("n" -> "77"))
      } finally c.close()
    }
  }

  test("intermediate Produce versions v3–v8: one request shape, growing response") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("iv", 1)
        val advertised = c.apiVersions()(0) // Produce
        assert(advertised == (3, 9), s"Produce range $advertised")
        var expectBase = 0L
        for (ver <- 3 to 8) {
          val batch = KafkaWire.encodeBatch(Seq(
            Broker.Stored(0, 0L, s"k$ver".getBytes, s"v$ver".getBytes,
              Map.empty, 1000L + ver)))
          val r = c.rawRequest(0, ver) { b =>
            b.nstr(null) // transactional_id
            b.i16(1)     // acks
            b.i32(5000)  // timeout
            b.array(Seq("iv")) { t =>
              b.str(t)
              b.array(Seq(0)) { p => b.i32(p); b.nbytes(batch) }
            }
          }
          // response: [topic, [p, err, base_off, lat(v2+), lso(v5+),
          // record_errors+error_message(v8+)]], throttle(v1+)
          val topics = r.array {
            val t = r.str()
            val parts = r.array {
              val p = r.i32(); val err = r.i16(); val off = r.i64()
              r.i64() // log_append_time
              if (ver >= 5) assert(r.i64() == 0L) // log_start_offset
              if (ver >= 8) {
                assert(r.i32() == 0)    // record_errors empty
                assert(r.nstr() == null) // error_message
              }
              (p, err, off)
            }
            (t, parts)
          }
          r.i32() // throttle
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          assert(topics == Seq(("iv", Seq((0, 0.toShort, expectBase)))),
            s"produce v$ver -> $topics")
          expectBase += 1
        }
        assert(c.endOffset("iv", 0) == 6L)
      } finally c.close()
    }
  }

  test("intermediate Fetch versions v5–v12: session/epoch/rack fields version-gated") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("fv", 1)
        assert(c.apiVersions()(1) == (4, 13)) // Fetch range
        c.append("fv", 0, (0 until 7).map(i =>
          Broker.Record(s"k$i".getBytes, s"v$i".getBytes, Map.empty, 50L + i)))
        // non-flexible v5–v11
        for (ver <- 5 to 11) {
          val r = c.rawRequest(1, ver) { b =>
            b.i32(-1); b.i32(100); b.i32(1); b.i32(1 << 20); b.i8(0)
            if (ver >= 7) { b.i32(0); b.i32(-1) } // session_id, epoch
            b.array(Seq("fv")) { t =>
              b.str(t)
              b.array(Seq(0)) { p =>
                b.i32(p)
                if (ver >= 9) b.i32(-1) // current_leader_epoch
                b.i64(0L)               // fetch_offset
                b.i64(-1L)              // log_start_offset
                b.i32(1 << 20)          // partition_max_bytes
              }
            }
            if (ver >= 7) b.array(Seq.empty[String]) { t =>
              b.str(t); b.array(Seq.empty[Int])(b.i32)
            }
            if (ver >= 11) b.str("rack-a")
          }
          r.i32() // throttle
          if (ver >= 7) { assert(r.i16() == 0); r.i32() } // err, session
          val topics = r.array {
            val t = r.str()
            val parts = r.array {
              val p = r.i32(); val err = r.i16(); val hw = r.i64()
              r.i64()                 // last_stable_offset
              assert(r.i64() == 0L)   // log_start_offset (v5+)
              assert(r.i32() == -1)   // aborted_transactions null
              if (ver >= 11) assert(r.i32() == -1) // preferred_read_replica
              val recs = r.nbytes()
              (p, err, hw, recs)
            }
            (t, parts)
          }
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          val (t, Seq((p, err, hw, recs))) = topics.head
          assert((t, p, err.toInt, hw) == ("fv", 0, 0, 7L), s"fetch v$ver")
          val decoded = KafkaWire.decodeBatches(recs, 0, assignFrom = None)
          assert(decoded.size == 7, s"fetch v$ver got ${decoded.size}")
          assert(new String(decoded(3).value) == "v3")
        }
        // flexible v12: topics addressed by NAME (ids arrive at v13)
        val r12 = c.rawRequest(1, 12) { b =>
          b.i32(-1); b.i32(100); b.i32(1); b.i32(1 << 20); b.i8(0)
          b.i32(0); b.i32(-1) // session_id, epoch
          b.carray(Seq("fv")) { t =>
            b.cstr(t)
            b.carray(Seq(0)) { p =>
              b.i32(p); b.i32(-1) // current_leader_epoch
              b.i64(0L); b.i32(-1) // fetch_offset, last_fetched_epoch
              b.i64(-1L); b.i32(1 << 20) // log_start, max_bytes
              b.tags()
            }
            b.tags()
          }
          b.carray(Seq.empty[String]) { _ => } // forgotten topics
          b.cstr("") // rack
          b.tags()
        }
        r12.i32() // throttle
        assert(r12.i16() == 0) // top-level error
        r12.i32() // session_id
        val t12 = r12.carray {
          val name = r12.cstr()
          val parts = r12.carray {
            val p = r12.i32(); val err = r12.i16(); val hw = r12.i64()
            r12.i64(); r12.i64() // lso, log_start
            r12.carray(r12.i32()) // aborted_transactions
            r12.i32()             // preferred_read_replica
            val recs = r12.cbytes()
            r12.tags()
            (p, err, hw, recs)
          }
          r12.tags()
          (name, parts)
        }
        r12.tags()
        assert(r12.remaining == 0, s"v12: ${r12.remaining} trailing bytes")
        val (n12, Seq((p12, e12, hw12, recs12))) = t12.head
        assert((n12, p12, e12.toInt, hw12) == ("fv", 0, 0, 7L))
        assert(KafkaWire.decodeBatches(recs12, 0, assignFrom = None).size == 7)
      } finally c.close()
    }
  }

  test("intermediate Metadata versions v0–v11: version-gated fields parse exactly") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("mv", 2)
        assert(c.apiVersions()(3) == (0, 12)) // Metadata range
        // non-flexible v0–v8
        for (ver <- 0 to 8) {
          val r = c.rawRequest(3, ver) { b =>
            b.array(Seq("mv"))(b.str)
            if (ver >= 4) b.i8(0) // allow_auto_topic_creation
            if (ver >= 8) { b.i8(0); b.i8(0) } // include_*_authorized_ops
          }
          if (ver >= 3) r.i32() // throttle
          val brokers = r.array {
            val id = r.i32(); val host = r.str(); val port = r.i32()
            if (ver >= 1) r.nstr() // rack
            (id, host, port)
          }
          assert(brokers == Seq((1, "127.0.0.1", srv.port)), s"v$ver")
          if (ver >= 2) assert(r.nstr() == "graft-loopback")
          if (ver >= 1) assert(r.i32() == 1) // controller
          val ts = r.array {
            val err = r.i16(); val name = r.str()
            if (ver >= 1) r.i8() // is_internal
            val parts = r.array {
              val pe = r.i16(); val idx = r.i32(); val leader = r.i32()
              if (ver >= 7) r.i32() // leader_epoch
              r.array(r.i32()); r.array(r.i32())
              if (ver >= 5) r.array(r.i32()) // offline
              (pe, idx, leader)
            }
            if (ver >= 8) r.i32() // topic_authorized_operations
            (err, name, parts)
          }
          if (ver >= 8) r.i32() // cluster_authorized_operations
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          assert(ts == Seq((0.toShort, "mv",
            Seq((0.toShort, 0, 1), (0.toShort, 1, 1)))), s"metadata v$ver")
        }
        // flexible v9–v11 (topic ids in request/response at v10;
        // cluster_authorized_operations gone at v11)
        for (ver <- 9 to 11) {
          val r = c.rawRequest(3, ver) { b =>
            b.carray(Seq("mv")) { t =>
              if (ver >= 10) b.uuid(0L, 0L)
              b.cnstr(t); b.tags()
            }
            b.i8(0)
            if (ver <= 10) b.i8(0)
            b.i8(0)
            b.tags()
          }
          r.i32() // throttle
          r.carray { r.i32(); r.cstr(); r.i32(); r.cstr(); r.tags() }
          assert(r.cstr() == "graft-loopback")
          assert(r.i32() == 1)
          val ts = r.carray {
            val err = r.i16(); val name = r.cstr()
            val tid = if (ver >= 10) r.uuid() else (0L, 0L)
            r.i8()
            val parts = r.carray {
              val pe = r.i16(); val idx = r.i32(); r.i32(); r.i32()
              r.carray(r.i32()); r.carray(r.i32()); r.carray(r.i32())
              r.tags()
              (pe, idx)
            }
            r.i32() // topic_authorized_operations
            r.tags()
            (err, name, tid, parts)
          }
          if (ver <= 10) r.i32() // cluster_authorized_operations
          r.tags()
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          val (err, name, tid, parts) = ts.head
          assert(err == 0 && name == "mv" &&
            parts == Seq((0.toShort, 0), (0.toShort, 1)), s"metadata v$ver")
          if (ver >= 10) assert(tid == KafkaWire.topicUuid("mv"))
        }
      } finally c.close()
    }
  }

  test("auto protocol negotiates flexible; legacy and flexible interoperate") {
    withServer { srv =>
      val auto = new KafkaWire.Client("127.0.0.1", srv.port) // auto
      val legacy = new KafkaWire.Client("127.0.0.1", srv.port,
        protocol = "legacy")
      try {
        // broker advertises the flexible generation
        val vs = auto.apiVersions()
        assert(vs(0)._2 >= 9 && vs(1)._2 >= 13, s"advertised: $vs")
        auto.createTopic("mix", 1)
        // legacy v3 produce → flexible v13 fetch reads the same log
        legacy.append("mix", 0, Seq(Broker.Record("a".getBytes,
          "legacy-write".getBytes, Map.empty, timestampMs = 1L)))
        auto.append("mix", 0, Seq(Broker.Record("b".getBytes,
          "flex-write".getBytes, Map.empty, timestampMs = 2L)))
        val viaFlex = auto.fetch("mix", 0, 0L, 2L).toVector
        val viaLegacy = legacy.fetch("mix", 0, 0L, 2L).toVector
        assert(viaFlex.map(r => new String(r.value)) ==
          Seq("legacy-write", "flex-write"))
        assert(viaLegacy.map(r => new String(r.value)) ==
          viaFlex.map(r => new String(r.value)))
      } finally { auto.close(); legacy.close() }
    }
  }

  test("flexible generation with compressed batches") {
    val srv = new KafkaWire.Server(joinDelayMs = 80,
      fetchCodec = KafkaWire.CodecZstd)
    try {
      val c = new KafkaWire.Client("127.0.0.1", srv.port,
        produceCodec = KafkaWire.CodecLz4, protocol = "flexible")
      try {
        c.createTopic("fz", 1)
        c.append("fz", 0, (0 until 600).map { i =>
          Broker.Record(null, s"zz-$i".getBytes, Map.empty, timestampMs = i) })
        val got = c.fetch("fz", 0, 0L, 600L).toVector
        assert(got.size == 600 && new String(got(599).value) == "zz-599")
      } finally c.close()
    } finally srv.stop()
  }

  test("raw batch passthrough: fetch/produce verbatim, broker re-bases") {
    withServer { src =>
      withServer { dst =>
        val cs = new KafkaWire.Client("127.0.0.1", src.port)
        val cd = new KafkaWire.Client("127.0.0.1", dst.port)
        try {
          cs.createTopic("raw", 1); cd.createTopic("raw", 1)
          // pre-seed destination so re-basing is visible (dst ends at 2)
          cd.append("raw", 0, (0 until 2).map(i =>
            Broker.Record(null, s"seed-$i".getBytes, Map.empty, i.toLong)))
          // three source appends = three wire batches
          (0 until 3).foreach { b =>
            cs.append("raw", 0, (0 until 4).map(i =>
              Broker.Record(s"k$b-$i".getBytes, s"v$b-$i".getBytes,
                Map("h" -> s"$b"), 100L + i)))
          }
          // copy raw: offsets advance by whole batches from 0
          var from = 0L
          var copied = 0
          while (from < 12) {
            val (bytes, cnt, _) = cs.fetchRawBatches("raw", 0, from)
            assert(cnt > 0, s"no raw progress at $from")
            val base = cd.appendRawBatches("raw", 0, bytes)
            assert(base == 2 + from, "destination re-bases past the seed")
            copied += cnt
            from += cnt
          }
          assert(copied == 12)
          val got = cd.fetch("raw", 0, 2L, 14L).toVector
          assert(got.map(r => new String(r.value)) ==
            (0 until 3).flatMap(b => (0 until 4).map(i => s"v$b-$i")))
          assert(got.map(_.offset) == (2L until 14L))
          assert(got.head.headers == Map("h" -> "0"))
        } finally { cs.close(); cd.close() }
      }
    }
  }

  test("mid-batch fetch offsets still resolve (re-encode fallback)") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("mid", 1)
        c.append("mid", 0, (0 until 10).map(i =>
          Broker.Record(null, s"m$i".getBytes, Map.empty, i.toLong)))
        // offset 3 is inside the single 10-record batch
        val got = c.fetch("mid", 0, 3L, 7L).toVector
        assert(got.map(r => new String(r.value)) ==
          (3 until 7).map(i => s"m$i"))
      } finally c.close()
    }
  }

  test("ListOffsets v1-v7: isolation/epoch/flexible/max-timestamp version-gated") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("lo", 1)
        assert(c.apiVersions()(2) == (1, 7)) // ListOffsets range
        c.append("lo", 0, (0 until 5).map(i =>
          Broker.Record(null, s"o$i".getBytes, Map.empty, 10L + i)))
        for (ver <- 1 to 7) {
          val flex = ver >= 6
          def ask(ts: Long): Long = {
            val r = c.rawRequest(2, ver) { b =>
              b.i32(-1) // replica_id
              if (ver >= 2) b.i8(0) // isolation_level
              if (flex) {
                b.carray(Seq("lo")) { t =>
                  b.cstr(t)
                  b.carray(Seq(0)) { p =>
                    b.i32(p); b.i32(-1); b.i64(ts); b.tags()
                  }
                  b.tags()
                }
                b.tags()
              } else b.array(Seq("lo")) { t =>
                b.str(t)
                b.array(Seq(0)) { p =>
                  b.i32(p)
                  if (ver >= 4) b.i32(-1) // current_leader_epoch
                  b.i64(ts)
                }
              }
            }
            if (ver >= 2) r.i32() // throttle
            val out = if (flex) {
              val ts2 = r.carray {
                val t = r.cstr()
                val ps = r.carray {
                  val p = r.i32(); val err = r.i16(); r.i64() // timestamp
                  val off = r.i64(); r.i32() // leader_epoch
                  r.tags()
                  (p, err, off)
                }
                r.tags(); (t, ps)
              }
              r.tags(); ts2
            } else r.array {
              val t = r.str()
              val ps = r.array {
                val p = r.i32(); val err = r.i16(); r.i64()
                val off = r.i64()
                if (ver >= 4) r.i32() // leader_epoch
                (p, err, off)
              }
              (t, ps)
            }
            assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
            val (t, Seq((p, err, off))) = out.head
            assert(t == "lo" && p == 0 && err == 0, s"list_offsets v$ver")
            off
          }
          assert(ask(-1L) == 5L, s"latest v$ver")
          assert(ask(-2L) == 0L, s"earliest v$ver")
          if (ver >= 7) assert(ask(-3L) == 4L, "max-timestamp v7 (KIP-734)")
        }
      } finally c.close()
    }
  }

  test("FindCoordinator v0-v4: key_type, flexible, batched keys (KIP-699)") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        assert(c.apiVersions()(10) == (0, 4))
        for (ver <- 0 to 3) {
          val flex = ver >= 3
          val r = c.rawRequest(10, ver) { b =>
            if (flex) b.cstr("g1") else b.str("g1")
            if (ver >= 1) b.i8(0) // key_type
            if (flex) b.tags()
          }
          if (ver >= 1) r.i32() // throttle
          assert(r.i16() == 0, s"v$ver error")
          if (ver >= 1)
            assert((if (flex) r.cstr() else r.nstr()) == null) // error_message
          assert(r.i32() == 1) // node_id
          assert((if (flex) r.cstr() else r.str()) == "127.0.0.1")
          assert(r.i32() == srv.port)
          if (flex) r.tags()
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
        }
        val r4 = c.rawRequest(10, 4) { b =>
          b.i8(0) // key_type
          b.carray(Seq("g1", "g2"))(b.cstr)
          b.tags()
        }
        r4.i32() // throttle
        val coords = r4.carray {
          val k = r4.cstr(); val node = r4.i32(); val host = r4.cstr()
          val port = r4.i32(); val err = r4.i16(); val msg = r4.cstr()
          r4.tags()
          (k, node, host, port, err, msg)
        }
        r4.tags()
        assert(r4.remaining == 0, s"v4: ${r4.remaining} trailing bytes")
        assert(coords == Seq(
          ("g1", 1, "127.0.0.1", srv.port, 0.toShort, null),
          ("g2", 1, "127.0.0.1", srv.port, 0.toShort, null)))
      } finally c.close()
    }
  }

  test("OffsetFetch v2-v8: epoch/flexible/require_stable/batched groups (KIP-709)") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        assert(c.apiVersions()(9) == (2, 8))
        c.createTopic("of", 2)
        // simple (non-group) commit: generation -1, empty member
        val rc = c.rawRequest(8, 2) { b =>
          b.str("og"); b.i32(-1); b.str(""); b.i64(-1L)
          b.array(Seq("of")) { t =>
            b.str(t)
            b.array(Seq((0, 41L), (1, 42L))) { case (p, off) =>
              b.i32(p); b.i64(off); b.nstr(null)
            }
          }
        }
        rc.array { rc.str(); rc.array { rc.i32(); assert(rc.i16() == 0) } }
        for (ver <- 2 to 7) {
          val flex = ver >= 6
          val r = c.rawRequest(9, ver) { b =>
            if (flex) b.cstr("og") else b.str("og")
            if (flex) b.carray(Seq("of")) { t =>
              b.cstr(t); b.carray(Seq(0, 1))(b.i32); b.tags()
            } else b.array(Seq("of")) { t =>
              b.str(t); b.array(Seq(0, 1))(b.i32)
            }
            if (ver >= 7) b.i8(0) // require_stable
            if (flex) b.tags()
          }
          if (ver >= 3) r.i32() // throttle
          val ts = if (flex) r.carray {
            val t = r.cstr()
            val ps = r.carray {
              val p = r.i32(); val off = r.i64(); r.i32(); r.cstr()
              assert(r.i16() == 0); r.tags(); (p, off)
            }
            r.tags(); (t, ps)
          } else r.array {
            val t = r.str()
            val ps = r.array {
              val p = r.i32(); val off = r.i64()
              if (ver >= 5) r.i32() // committed_leader_epoch
              r.nstr(); assert(r.i16() == 0); (p, off)
            }
            (t, ps)
          }
          assert(r.i16() == 0) // top-level error
          if (flex) r.tags()
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          assert(ts == Seq(("of", Seq((0, 41L), (1, 42L)))),
            s"offset_fetch v$ver -> $ts")
        }
        // v8: whole groups batched; per-group error replaces top-level
        val r8 = c.rawRequest(9, 8) { b =>
          b.carray(Seq("og", "absent")) { g =>
            b.cstr(g)
            b.carray(Seq("of")) { t =>
              b.cstr(t); b.carray(Seq(0, 1))(b.i32); b.tags()
            }
            b.tags()
          }
          b.i8(0) // require_stable
          b.tags()
        }
        r8.i32() // throttle
        val gs = r8.carray {
          val g = r8.cstr()
          val ts = r8.carray {
            val t = r8.cstr()
            val ps = r8.carray {
              val p = r8.i32(); val off = r8.i64(); r8.i32(); r8.cstr()
              assert(r8.i16() == 0); r8.tags(); (p, off)
            }
            r8.tags(); (t, ps)
          }
          assert(r8.i16() == 0); r8.tags()
          (g, ts)
        }
        r8.tags()
        assert(r8.remaining == 0, s"v8: ${r8.remaining} trailing bytes")
        assert(gs == Seq(
          ("og", Seq(("of", Seq((0, 41L), (1, 42L))))),
          ("absent", Seq(("of", Seq((0, -1L), (1, -1L)))))))
      } finally c.close()
    }
  }

  test("group membership lifecycle at every advertised version (r15)") {
    // JoinGroup 2-9 / SyncGroup 1-5 / Heartbeat 1-4 / LeaveGroup 1-5 /
    // OffsetCommit 2-8: one full join→sync→heartbeat→commit→leave
    // lifecycle per JoinGroup version, with the companion apis at the
    // version a client of that era pairs with it. Every request is
    // hand-built field-by-field so a version-gated field in the wrong
    // place fails loudly (trailing-bytes assert).
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        val vs = c.apiVersions()
        assert(vs(11) == (2, 9), s"JoinGroup range: ${vs(11)}")
        assert(vs(14) == (1, 5), s"SyncGroup range: ${vs(14)}")
        assert(vs(12) == (1, 4), s"Heartbeat range: ${vs(12)}")
        assert(vs(13) == (1, 5), s"LeaveGroup range: ${vs(13)}")
        assert(vs(8) == (2, 8), s"OffsetCommit range: ${vs(8)}")
        c.createTopic("grp-t", 1)
        val meta = "sub-meta".getBytes
        val assign = "assignment-bytes".getBytes
        // (join, sync, heartbeat, leave, commit) version eras
        val eras = Seq((2, 1, 1, 1, 2), (3, 1, 1, 1, 3), (4, 2, 2, 2, 4),
          (5, 3, 3, 3, 5), (6, 4, 4, 4, 6), (7, 5, 4, 5, 7),
          (8, 5, 4, 5, 8), (9, 5, 4, 5, 8))
        for ((jv, sv, hv, lv, cv) <- eras) {
          val group = s"g-v$jv"
          // ── JoinGroup ────────────────────────────────────────────
          val flexJ = jv >= 6
          def doJoin(memberIdIn: String) = c.rawRequest(11, jv) { b =>
            if (flexJ) {
              b.cstr(group); b.i32(30000); b.i32(5000); b.cstr(memberIdIn)
              if (jv >= 5) b.cnstr(null) // group_instance_id
              b.cstr("consumer")
              b.carray(Seq("range")) { n => b.cstr(n); b.cbytes(meta); b.tags() }
              if (jv >= 8) b.cnstr("rebalance test") // reason
              b.tags()
            } else {
              b.str(group); b.i32(30000); b.i32(5000); b.str(memberIdIn)
              if (jv >= 5) b.nstr(null)
              b.str("consumer")
              b.array(Seq("range")) { n => b.str(n); b.bytes(meta) }
            }
          }
          var rj = doJoin("")
          rj.i32() // throttle
          if (jv >= 4) {
            // KIP-394: v4+ first join with an empty member id answers
            // MEMBER_ID_REQUIRED plus a broker-issued id; rejoin with it
            assert(rj.i16() == 79, s"join v$jv should demand a member id")
            rj.i32() // generation (-1)
            if (jv >= 7) { if (flexJ) rj.cstr() else rj.nstr() }
            if (flexJ) rj.cstr() else rj.str() // protocol_name
            if (flexJ) rj.cstr() else rj.str() // leader
            if (jv >= 9) rj.i8()
            val issued = if (flexJ) rj.cstr() else rj.str()
            if (flexJ) { rj.carray { rj.cstr(); rj.cstr(); rj.cbytes(); rj.tags() }; rj.tags() }
            else rj.array { rj.str(); if (jv >= 5) rj.nstr(); rj.bytes() }
            assert(rj.remaining == 0, s"join-394 v$jv: ${rj.remaining} trailing")
            assert(issued.nonEmpty, s"join v$jv issued id")
            rj = doJoin(issued)
            rj.i32() // throttle
          }
          assert(rj.i16() == 0, s"join v$jv error")
          val gen = rj.i32()
          if (jv >= 7)
            assert((if (flexJ) rj.cstr() else rj.nstr()) == "consumer",
              s"join v$jv protocol_type (KIP-559)")
          assert((if (flexJ) rj.cstr() else rj.str()) == "range")
          val leader = if (flexJ) rj.cstr() else rj.str()
          if (jv >= 9) assert(rj.i8() == 0) // skip_assignment
          val me = if (flexJ) rj.cstr() else rj.str()
          val members =
            if (flexJ) rj.carray {
              val m = rj.cstr(); rj.cstr(); val mm = rj.cbytes(); rj.tags()
              (m, mm)
            } else rj.array {
              val m = rj.str()
              if (jv >= 5) rj.nstr()
              (m, rj.bytes())
            }
          if (flexJ) rj.tags()
          assert(rj.remaining == 0, s"join v$jv: ${rj.remaining} trailing")
          assert(leader == me && members.map(_._1) == Seq(me), s"join v$jv")
          assert(new String(members.head._2) == "sub-meta")
          // ── SyncGroup ────────────────────────────────────────────
          val flexS = sv >= 4
          val rs = c.rawRequest(14, sv) { b =>
            if (flexS) {
              b.cstr(group); b.i32(gen); b.cstr(me)
              if (sv >= 3) b.cnstr(null)
              if (sv >= 5) { b.cnstr("consumer"); b.cnstr("range") }
              b.carray(Seq(me)) { m => b.cstr(m); b.cbytes(assign); b.tags() }
              b.tags()
            } else {
              b.str(group); b.i32(gen); b.str(me)
              if (sv >= 3) b.nstr(null)
              b.array(Seq(me)) { m => b.str(m); b.bytes(assign) }
            }
          }
          rs.i32() // throttle
          assert(rs.i16() == 0, s"sync v$sv error")
          if (sv >= 5) {
            assert(rs.cstr() == "consumer"); assert(rs.cstr() == "range")
          }
          val back = if (flexS) rs.cbytes() else rs.bytes()
          if (flexS) rs.tags()
          assert(rs.remaining == 0, s"sync v$sv: ${rs.remaining} trailing")
          assert(new String(back) == "assignment-bytes", s"sync v$sv")
          // ── Heartbeat ────────────────────────────────────────────
          val flexH = hv >= 4
          val rh = c.rawRequest(12, hv) { b =>
            if (flexH) {
              b.cstr(group); b.i32(gen); b.cstr(me); b.cnstr(null); b.tags()
            } else {
              b.str(group); b.i32(gen); b.str(me)
              if (hv >= 3) b.nstr(null)
            }
          }
          rh.i32() // throttle
          assert(rh.i16() == 0, s"heartbeat v$hv error")
          if (flexH) rh.tags()
          assert(rh.remaining == 0, s"heartbeat v$hv: ${rh.remaining} trailing")
          // ── OffsetCommit ─────────────────────────────────────────
          val flexC = cv >= 8
          val off = 100L + jv
          val rc = c.rawRequest(8, cv) { b =>
            if (flexC) {
              b.cstr(group); b.i32(gen); b.cstr(me); b.cnstr(null)
              b.carray(Seq("grp-t")) { t =>
                b.cstr(t)
                b.carray(Seq(0)) { p =>
                  b.i32(p); b.i64(off); b.i32(-1); b.cnstr(null); b.tags()
                }
                b.tags()
              }
              b.tags()
            } else {
              b.str(group); b.i32(gen); b.str(me)
              if (cv >= 7) b.nstr(null) // group_instance_id
              if (cv <= 4) b.i64(-1L) // retention_time_ms (KIP-211)
              b.array(Seq("grp-t")) { t =>
                b.str(t)
                b.array(Seq(0)) { p =>
                  b.i32(p); b.i64(off)
                  if (cv >= 6) b.i32(-1) // committed_leader_epoch
                  b.nstr(null)
                }
              }
            }
          }
          if (cv >= 3) rc.i32() // throttle
          if (flexC) {
            rc.carray { rc.cstr(); rc.carray { rc.i32()
              assert(rc.i16() == 0, s"commit v$cv"); rc.tags() }; rc.tags() }
            rc.tags()
          } else rc.array { rc.str(); rc.array { rc.i32()
            assert(rc.i16() == 0, s"commit v$cv") } }
          assert(rc.remaining == 0, s"commit v$cv: ${rc.remaining} trailing")
          // committed offset visible through OffsetFetch (pinned v2)
          val rf = c.rawRequest(9, 2) { b =>
            b.str(group)
            b.array(Seq("grp-t")) { t => b.str(t); b.array(Seq(0))(b.i32) }
          }
          rf.array { rf.str(); rf.array {
            rf.i32(); assert(rf.i64() == off, s"fetch after commit v$cv")
            rf.nstr(); assert(rf.i16() == 0) } }
          assert(rf.i16() == 0)
          // ── LeaveGroup ───────────────────────────────────────────
          val flexL = lv >= 4
          val rl = c.rawRequest(13, lv) { b =>
            if (flexL) {
              b.cstr(group)
              b.carray(Seq(me)) { m =>
                b.cstr(m); b.cnstr(null)
                if (lv >= 5) b.cnstr("shutdown") // reason
                b.tags()
              }
              b.tags()
            } else if (lv >= 3) {
              b.str(group)
              b.array(Seq(me)) { m => b.str(m); b.nstr(null) }
            } else { b.str(group); b.str(me) }
          }
          rl.i32() // throttle
          assert(rl.i16() == 0, s"leave v$lv error")
          if (lv >= 3) {
            if (flexL) rl.carray {
              assert(rl.cstr() == me); rl.cstr()
              assert(rl.i16() == 0); rl.tags()
            } else rl.array {
              assert(rl.str() == me); rl.nstr(); assert(rl.i16() == 0)
            }
          }
          if (flexL) rl.tags()
          assert(rl.remaining == 0, s"leave v$lv: ${rl.remaining} trailing")
          // heartbeat after leave: the member is gone
          val rh2 = c.rawRequest(12, 1) { b =>
            b.str(group); b.i32(gen); b.str(me)
          }
          rh2.i32()
          assert(rh2.i16() != 0, s"heartbeat after leave v$lv should fail")
        }
      } finally c.close()
    }
  }

  test("group client negotiates flexible versions; legacy pin still works") {
    // the Client's group methods speak the negotiated max (JoinGroup v9
    // / SyncGroup v5 / Heartbeat v4 / LeaveGroup v5 / OffsetCommit v8 /
    // OffsetFetch v7 / FindCoordinator v3) against this broker, and the
    // sarama-era floor under protocol="legacy" — both through the same
    // GroupMember state machine
    withServer { srv =>
      for (proto <- Seq("auto", "legacy")) {
        val c = new KafkaWire.Client("127.0.0.1", srv.port, protocol = proto)
        try {
          c.createTopic(s"neg-$proto", 2)
          val (host, port) = c.findCoordinator(s"ng-$proto")
          assert(host == "127.0.0.1" && port == srv.port, s"coord $proto")
          val (gen, leader, me, members) =
            c.joinGroup(s"ng-$proto", "", Seq(s"neg-$proto"))
          assert(leader == me && members.map(_._1) == Seq(me), s"join $proto")
          assert(members.head._2 == Seq(s"neg-$proto"), s"subscription $proto")
          val assigned = c.syncGroup(s"ng-$proto", gen, me,
            Seq(me -> Map(s"neg-$proto" -> Seq(0, 1))))
          assert(assigned == Map(s"neg-$proto" -> Seq(0, 1)), s"sync $proto")
          assert(c.heartbeat(s"ng-$proto", gen, me) == 0, s"heartbeat $proto")
          c.commitOffsets(s"ng-$proto", gen, me,
            Map((s"neg-$proto", 0) -> 17L, (s"neg-$proto", 1) -> 23L))
          assert(c.committedOffsets(s"ng-$proto") ==
            Seq((s"neg-$proto", 0, 17L), (s"neg-$proto", 1, 23L)),
            s"committed $proto")
          c.leaveGroup(s"ng-$proto", me)
          assert(c.heartbeat(s"ng-$proto", gen, me) != 0,
            s"heartbeat after leave $proto")
        } finally c.close()
      }
    }
  }

  test("Metadata v10+: lookup by topic id with null name (ADVICE r14)") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("byid", 1)
        val (hi, lo) = KafkaWire.topicUuid("byid")
        for (ver <- 10 to 12) {
          val r = c.rawRequest(3, ver) { b =>
            b.carray(Seq(0, 1)) { i =>
              if (i == 0) b.uuid(hi, lo) else b.uuid(123L, 456L)
              b.cnstr(null); b.tags()
            }
            b.i8(0)
            if (ver <= 10) b.i8(0)
            b.i8(0)
            b.tags()
          }
          r.i32() // throttle
          r.carray { r.i32(); r.cstr(); r.i32(); r.cstr(); r.tags() }
          r.cstr(); r.i32() // cluster_id, controller
          val ts = r.carray {
            val err = r.i16(); val name = r.cstr(); val tid = r.uuid()
            r.i8()
            val nparts = r.carray {
              r.i16(); r.i32(); r.i32(); r.i32()
              r.carray(r.i32()); r.carray(r.i32()); r.carray(r.i32())
              r.tags()
            }.size
            r.i32(); r.tags()
            (err, name, tid, nparts)
          }
          if (ver <= 10) r.i32()
          r.tags()
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          assert(ts == Seq(
            (0.toShort, "byid", (hi, lo), 1),
            (100.toShort, null, (123L, 456L), 0)), s"metadata-by-id v$ver")
        }
      } finally c.close()
    }
  }

  test("kafka:// address query selects the producer codec") {
    withServer { srv =>
      val addr = s"127.0.0.1:${srv.port}?compression=snappy"
      val t = KafkaWire.clientFor(addr)
      t.createTopic("q", 1)
      t.append("q", 0, Seq(Broker.Record("k".getBytes, "v".getBytes,
        Map.empty, timestampMs = 9L)))
      assert(new String(t.fetch("q", 0, 0L, 1L).next().value) == "v")
      KafkaWire.dropClient(addr)
    }
  }

  test("KIP-559: protocol cross-checks answer INCONSISTENT_GROUP_PROTOCOL") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("kp", 1)
        // establish a live "consumer"/"range" group
        val (gen, _, me, _) = c.joinGroup("kp-g", "", Seq("kp"))
        c.syncGroup("kp-g", gen, me, Seq(me -> Map("kp" -> Seq(0))))
        // a joiner with a contradicting protocol TYPE is rejected
        val rj = c.rawRequest(11, 9) { b =>
          b.cstr("kp-g"); b.i32(30000); b.i32(5000); b.cstr("someone")
          b.cnstr(null); b.cstr("connect")
          b.carray(Seq("range")) { n => b.cstr(n); b.cbytes(Array[Byte](0, 0)); b.tags() }
          b.cnstr(null); b.tags()
        }
        rj.i32()
        assert(rj.i16() == 23, "join with wrong protocol_type")
        // SyncGroup v5 carrying the wrong protocol NAME is rejected
        val rs = c.rawRequest(14, 5) { b =>
          b.cstr("kp-g"); b.i32(gen); b.cstr(me); b.cnstr(null)
          b.cnstr("consumer"); b.cnstr("roundrobin")
          b.carray(Seq.empty[Int])(_ => ()); b.tags()
        }
        rs.i32()
        assert(rs.i16() == 23, "sync with wrong protocol_name")
      } finally c.close()
    }
  }

  test("ListGroups v0–v4 + DescribeGroups v0–v5: live and empty groups") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("lg", 2)
        // one live Stable group...
        val (gen, _, me, _) = c.joinGroup("lg-live", "", Seq("lg"))
        c.syncGroup("lg-live", gen, me, Seq(me -> Map("lg" -> Seq(0, 1))))
        // ...and one Empty group holding only committed offsets
        c.commitGroupOffset("lg-empty", "lg", 0, 5L)
        assert(c.listGroups() == Seq("lg-empty", "lg-live"))
        // raw-frame sweep: every advertised ListGroups version parses
        for (ver <- 0 to 4) {
          val flex = ver >= 3
          val r = c.rawRequest(16, ver) { b =>
            if (ver >= 4) b.carray(Seq.empty[String])(_ => ())
            if (flex) b.tags()
          }
          if (ver >= 1) r.i32() // throttle
          assert(r.i16() == 0, s"list v$ver error")
          val gs =
            if (flex) r.carray {
              val g = r.cstr(); r.cstr()
              val st = if (ver >= 4) r.cstr() else null
              r.tags(); (g, st)
            } else r.array { val g = r.str(); r.str(); (g, null) }
          if (flex) r.tags()
          assert(r.remaining == 0, s"list v$ver: ${r.remaining} trailing")
          assert(gs.map(_._1).sorted == Seq("lg-empty", "lg-live"))
          if (ver >= 4)
            assert(gs.toMap.apply("lg-live") == "Stable" &&
                   gs.toMap.apply("lg-empty") == "Empty")
        }
        // v4 states_filter narrows
        val rf = c.rawRequest(16, 4) { b =>
          b.carray(Seq("Stable"))(b.cstr); b.tags()
        }
        rf.i32(); assert(rf.i16() == 0)
        val filtered = rf.carray { val g = rf.cstr(); rf.cstr(); rf.cstr(); rf.tags(); g }
        assert(filtered == Seq("lg-live"))
        // DescribeGroups at the negotiated version + unknown group → Dead
        val desc = c.describeGroups(Seq("lg-live", "nope"))
          .map { case (g, st, pt, ms) => g -> ((st, pt, ms)) }.toMap
        assert(desc("lg-live") == (("Stable", "consumer", Seq(me))))
        assert(desc("nope")._1 == "Dead")
        // raw-frame sweep across DescribeGroups versions
        for (ver <- 0 to 5) {
          val flex = ver >= 5
          val r = c.rawRequest(15, ver) { b =>
            if (flex) b.carray(Seq("lg-live"))(b.cstr)
            else b.array(Seq("lg-live"))(b.str)
            if (ver >= 3) b.i8(0)
            if (flex) b.tags()
          }
          if (ver >= 1) r.i32()
          def rs(): String = if (flex) r.cstr() else r.str()
          def oneGroup(): Seq[String] = {
            assert(r.i16() == 0, s"describe v$ver error")
            assert(rs() == "lg-live" && rs() == "Stable" && rs() == "consumer")
            assert(rs() == "range", s"describe v$ver protocol_data")
            val ms = if (flex) r.carray {
              val m = r.cstr(); r.cstr(); r.cstr(); r.cstr()
              r.cbytes(); r.cbytes(); r.tags(); m
            } else r.array {
              val m = r.str(); if (ver >= 4) r.nstr()
              r.str(); r.str(); r.bytes(); r.bytes(); m
            }
            if (ver >= 3) r.i32()
            if (flex) r.tags()
            ms
          }
          val groupRows = if (flex) r.carray(oneGroup()) else r.array(oneGroup())
          if (flex) r.tags()
          assert(r.remaining == 0, s"describe v$ver: ${r.remaining} trailing")
          assert(groupRows == Seq(Seq(me)), s"describe v$ver members")
        }
      } finally c.close()
    }
  }

  test("DeleteTopics v1–v6: delete by name and by id; unknowns answer errors") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        for (ver <- 1 to 6) {
          val t = s"del-v$ver"
          c.createTopic(t, 1)
          val flex = ver >= 4
          val r = c.rawRequest(20, ver) { b =>
            if (ver >= 6) b.carray(Seq(t)) { n => b.cnstr(n); b.uuid(0L, 0L); b.tags() }
            else if (flex) b.carray(Seq(t))(b.cstr)
            else b.array(Seq(t))(b.str)
            b.i32(10000)
            if (flex) b.tags()
          }
          r.i32() // throttle (v1+)
          def one(): Short = {
            if (ver >= 6) { if (flex) r.cstr() else r.nstr() }
            else if (flex) r.cstr() else r.str()
            if (ver >= 6) r.uuid()
            val err = r.i16()
            if (ver >= 5) r.cstr()
            if (flex) r.tags()
            err
          }
          val errs = if (flex) { val e = r.carray(one()); r.tags(); e }
                     else r.array(one())
          assert(r.remaining == 0, s"delete v$ver: ${r.remaining} trailing")
          assert(errs == Seq(0.toShort), s"delete v$ver")
          intercept[KafkaWire.WireError] { c.partitionCount(t) }
        }
        // client helper + unknown-name / unknown-id errors
        c.createTopic("del-x", 1)
        c.deleteTopics(Seq("del-x"))
        val e = intercept[KafkaWire.WireError] { c.deleteTopics(Seq("del-x")) }
        assert(e.code == KafkaWire.ErrUnknownTopicOrPartition)
        val r6 = c.rawRequest(20, 6) { b =>
          b.carray(Seq(1)) { _ => b.cnstr(null); b.uuid(42L, 43L); b.tags() }
          b.i32(10000); b.tags()
        }
        r6.i32()
        r6.carray {
          assert(r6.cstr() == null); assert(r6.uuid() == ((42L, 43L)))
          assert(r6.i16() == KafkaWire.ErrUnknownTopicId)
          r6.cstr(); r6.tags()
        }
        r6.tags()
        assert(r6.remaining == 0)
      } finally c.close()
    }
  }

  test("SASL PLAIN: gated broker rejects anonymous and bad credentials") {
    val srv = new KafkaWire.Server(joinDelayMs = 80,
      saslUsers = Map("svc" -> "hunter2"))
    try {
      // authenticated client: full produce/fetch lifecycle works
      val ok = new KafkaWire.Client("127.0.0.1", srv.port,
        saslPlain = Some(("svc", "hunter2")))
      try {
        ok.createTopic("sasl-t", 1)
        ok.append("sasl-t", 0, Seq(Broker.Record("k".getBytes, "v".getBytes)))
        assert(new String(ok.fetch("sasl-t", 0, 0L, 1L).next().value) == "v")
      } finally ok.close()
      // wrong password: SaslAuthenticate answers 58
      val bad = new KafkaWire.Client("127.0.0.1", srv.port,
        saslPlain = Some(("svc", "wrong")))
      val e = intercept[KafkaWire.WireError] { bad.listTopics() }
      assert(e.code == KafkaWire.ErrSaslAuthenticationFailed)
      bad.close()
      // unknown mechanism: handshake answers 33 + the mechanism menu
      val probe = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        val rh = probe.rawRequest(17, 1)(b => b.str("OAUTHBEARER"))
        assert(rh.i16() == KafkaWire.ErrUnsupportedSaslMechanism)
        assert(rh.array(rh.str()) == Seq("PLAIN", "SCRAM-SHA-256"))
        // the still-unauthenticated connection is killed on a data request
        intercept[Exception] { probe.listTopics() }
      } finally probe.close()
      // ApiVersions stays answerable pre-auth (clients need it to pick
      // handshake versions)
      val anon = new KafkaWire.Client("127.0.0.1", srv.port)
      try assert(anon.apiVersions().contains(17)) finally anon.close()
    } finally srv.stop()
  }

  test("SASL SCRAM-SHA-256: full RFC 5802 conversation, bad proof rejected") {
    val srv = new KafkaWire.Server(joinDelayMs = 80,
      saslUsers = Map("svc" -> "hunter2"))
    try {
      val ok = new KafkaWire.Client("127.0.0.1", srv.port,
        saslPlain = Some(("svc", "hunter2")),
        saslMechanism = "SCRAM-SHA-256")
      try {
        ok.createTopic("scram-t", 1)
        ok.append("scram-t", 0,
          Seq(Broker.Record("k".getBytes, "v".getBytes)))
        assert(new String(ok.fetch("scram-t", 0, 0L, 1L).next().value) == "v")
      } finally ok.close()
      // wrong password: the client's proof fails StoredKey verification
      val bad = new KafkaWire.Client("127.0.0.1", srv.port,
        saslPlain = Some(("svc", "wrong")),
        saslMechanism = "SCRAM-SHA-256")
      val e = intercept[KafkaWire.WireError] { bad.listTopics() }
      assert(e.code == KafkaWire.ErrSaslAuthenticationFailed)
      bad.close()
      // unknown user fails on the FIRST round (before any proof)
      val ghost = new KafkaWire.Client("127.0.0.1", srv.port,
        saslPlain = Some(("nobody", "x")),
        saslMechanism = "SCRAM-SHA-256")
      val e2 = intercept[KafkaWire.WireError] { ghost.listTopics() }
      assert(e2.code == KafkaWire.ErrSaslAuthenticationFailed)
      ghost.close()
      // the handshake menu advertises both mechanisms
      val probe = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        val rh = probe.rawRequest(17, 1)(b => b.str("GSSAPI"))
        assert(rh.i16() == KafkaWire.ErrUnsupportedSaslMechanism)
        assert(rh.array(rh.str()) == Seq("PLAIN", "SCRAM-SHA-256"))
      } finally probe.close()
    } finally srv.stop()
  }

  test("transactions: read_committed honors the LSO and hides aborted ranges") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      val cc = new KafkaWire.Client("127.0.0.1", srv.port,
        isolation = "read_committed")
      try {
        c.createTopic("txn", 1)
        assert(c.apiVersions().get(24).contains((0, 3))) // AddPartitionsToTxn
        assert(c.apiVersions().get(26).contains((0, 3))) // EndTxn
        def rec(s: String, off: Long = 0L) = Broker.Stored(0, off,
          null, s.getBytes, Map.empty, 1L)
        // plain record at offset 0
        c.append("txn", 0, Seq(Broker.Record(null, "plain".getBytes)))
        // open a transaction, write offsets 1-2
        val (pid, ep) = c.initProducerId("tx-1")
        c.addPartitionsToTxn("tx-1", pid, ep, Seq(("txn", 0)))
        val txBatch = KafkaWire.encodeBatch(Seq(rec("t0"), rec("t1", 1L)),
          producerId = pid, producerEpoch = ep, baseSequence = 0,
          attrsExtra = 0x10)
        c.appendRawBatches("txn", 0, txBatch)
        // OPEN txn: read_committed stops at the LSO (1); uncommitted sees all
        assert(cc.fetch("txn", 0, 0L, 10L).toVector.map(_.offset) == Seq(0L))
        assert(c.fetch("txn", 0, 0L, 10L).toVector.map(_.offset) ==
          Seq(0L, 1L, 2L))
        assert(cc.endOffset("txn", 0) == 1L,
          "read_committed ListOffsets answers the LSO (KIP-98)")
        assert(c.endOffset("txn", 0) == 3L) // uncommitted stays hwm-based
        // ABORT: marker at 3; committed reader skips the aborted range
        c.endTxn("tx-1", pid, ep, commit = false)
        assert(c.endOffset("txn", 0) == 4L)
        assert(c.fetch("txn", 0, 0L, 10L).toVector.map(_.offset) ==
          Seq(0L, 1L, 2L), "uncommitted sees aborted data, never markers")
        assert(cc.fetch("txn", 0, 0L, 10L).toVector.map(_.offset) == Seq(0L),
          "committed skips the aborted range and the marker")
        // COMMIT: a second txn at offsets 4-5, marker at 6
        val (pid2, ep2) = c.initProducerId("tx-2")
        c.addPartitionsToTxn("tx-2", pid2, ep2, Seq(("txn", 0)))
        val txBatch2 = KafkaWire.encodeBatch(Seq(rec("c0", 4L), rec("c1", 5L)),
          producerId = pid2, producerEpoch = ep2, baseSequence = 0,
          attrsExtra = 0x10)
        c.appendRawBatches("txn", 0, txBatch2)
        c.endTxn("tx-2", pid2, ep2, commit = true)
        val committed = cc.fetch("txn", 0, 0L, 10L).toVector
        assert(committed.map(_.offset) == Seq(0L, 4L, 5L),
          s"committed view: ${committed.map(_.offset)}")
        assert(new String(committed(1).value) == "c0")
        assert(c.fetch("txn", 0, 0L, 10L).toVector.map(_.offset) ==
          Seq(0L, 1L, 2L, 4L, 5L))
        // a fenced epoch cannot end a transaction
        val (pid3, ep3) = c.initProducerId("tx-3")
        c.addPartitionsToTxn("tx-3", pid3, ep3, Seq(("txn", 0)))
        val (_, ep3b) = c.initProducerId("tx-3") // bump fences ep3
        assert(ep3b == ep3 + 1)
        val e = intercept[KafkaWire.WireError] {
          c.endTxn("tx-3", pid3, ep3, commit = true)
        }
        assert(e.code == KafkaWire.ErrInvalidProducerEpoch)
      } finally { c.close(); cc.close() }
    }
  }

  test("wire-to-wire migration discovers groups via ListGroups") {
    val src = new KafkaWire.Server(joinDelayMs = 80)
    val dst = new KafkaWire.Server(joinDelayMs = 80)
    try {
      val sc = new KafkaWire.Client("127.0.0.1", src.port)
      sc.createTopic("mt", 2)
      sc.append("mt", 0, (0 until 30).map(i =>
        Broker.Record(s"k$i".getBytes, s"v$i".getBytes)))
      sc.append("mt", 1, (0 until 20).map(i =>
        Broker.Record(null, s"w$i".getBytes)))
      sc.commitGroupOffset("analytics", "mt", 0, 12L)
      sc.commitGroupOffset("audit", "mt", 1, 20L)
      sc.close()
      val report = Migrator.migrate(spark,
        s"kafka://127.0.0.1:${src.port}", s"kafka://127.0.0.1:${dst.port}",
        syncAcls = false)
      assert(report.records == 50L, s"records ${report.records}")
      assert(report.groups == 2, s"groups ${report.groups}")
      val dc = new KafkaWire.Client("127.0.0.1", dst.port)
      try {
        assert(dc.committedOffsets("analytics") == Seq(("mt", 0, 12L)))
        assert(dc.committedOffsets("audit") == Seq(("mt", 1, 20L)))
      } finally dc.close()
      KafkaWire.dropClient(s"127.0.0.1:${src.port}")
      KafkaWire.dropClient(s"127.0.0.1:${dst.port}")
    } finally { src.stop(); dst.stop() }
  }

  test("InitProducerId v0–v4: fresh pid at epoch 0 at every version") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        assert(c.apiVersions().get(22).contains((0, 4)))
        val pids = (0 to 4).map { ver =>
          val flex = ver >= 2
          val r = c.rawRequest(22, ver) { b =>
            if (flex) b.cnstr(null) else b.nstr(null)
            b.i32(30000)
            if (ver >= 3) { b.i64(-1L); b.i16(-1) }
            if (flex) b.tags()
          }
          r.i32() // throttle
          assert(r.i16() == KafkaWire.ErrNone, s"v$ver error")
          val pid = r.i64()
          val epoch = r.i16()
          if (flex) r.tags()
          assert(r.remaining == 0, s"v$ver: ${r.remaining} trailing bytes")
          assert(pid > 0L && epoch == 0, s"v$ver pid/epoch")
          pid
        }
        assert(pids.distinct.size == 5) // each init allocates a new pid
      } finally c.close()
    }
  }

  test("idempotent produce: duplicate retry deduplicated, gaps rejected") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("idem", 1)
        val (pid, epoch) = c.initProducerId()
        assert(pid > 0L && epoch == 0)
        val recs = (0 until 10).map(i => Broker.Stored(0, i.toLong,
          s"k$i".getBytes, s"v$i".getBytes, Map.empty, 100L + i))
        val batch = KafkaWire.encodeBatch(recs,
          producerId = pid, producerEpoch = epoch, baseSequence = 0)
        assert(c.appendRawBatches("idem", 0, batch) == 0L)
        // the retry (identical bytes) is acked with the ORIGINAL base
        // offset and appends nothing
        assert(c.appendRawBatches("idem", 0, batch) == 0L)
        assert(c.endOffset("idem", 0) == 10L)
        // the next in-order batch (sequence 10) appends normally
        val recs2 = (0 until 5).map(i => Broker.Stored(0, i.toLong,
          null, s"w$i".getBytes, Map.empty, 200L + i))
        val next = KafkaWire.encodeBatch(recs2,
          producerId = pid, producerEpoch = epoch, baseSequence = 10)
        assert(c.appendRawBatches("idem", 0, next) == 10L)
        // a sequence gap answers OUT_OF_ORDER_SEQUENCE_NUMBER
        val gap = KafkaWire.encodeBatch(recs2,
          producerId = pid, producerEpoch = epoch, baseSequence = 99)
        val e = intercept[KafkaWire.WireError] {
          c.appendRawBatches("idem", 0, gap)
        }
        assert(e.code == KafkaWire.ErrOutOfOrderSequence)
        // the log holds exactly the 15 deduplicated records
        val got = c.fetch("idem", 0, 0L, 15L).toVector
        assert(got.size == 15)
        assert(new String(got(14).value) == "w4")
      } finally c.close()
    }
  }

  test("idempotent produce: a stale epoch is fenced") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        c.createTopic("fence", 1)
        val (pid, e0) = c.initProducerId("txn-1")
        val (pid2, e1) = c.initProducerId("txn-1") // re-init bumps the epoch
        assert(pid2 == pid && e1 == e0 + 1)
        val rec = Seq(Broker.Stored(0, 0L, null, "x".getBytes, Map.empty, 1L))
        val stale = KafkaWire.encodeBatch(rec,
          producerId = pid, producerEpoch = e0, baseSequence = 0)
        val err = intercept[KafkaWire.WireError] {
          c.appendRawBatches("fence", 0, stale)
        }
        assert(err.code == KafkaWire.ErrInvalidProducerEpoch)
        // the current epoch produces fine, sequences restarting at 0
        val fresh = KafkaWire.encodeBatch(rec,
          producerId = pid, producerEpoch = e1, baseSequence = 0)
        assert(c.appendRawBatches("fence", 0, fresh) == 0L)
        // a new-epoch batch NOT starting at sequence 0 is out of order
        val (_, e2) = c.initProducerId("txn-1")
        val nonzero = KafkaWire.encodeBatch(rec,
          producerId = pid, producerEpoch = e2, baseSequence = 7)
        val err2 = intercept[KafkaWire.WireError] {
          c.appendRawBatches("fence", 0, nonzero)
        }
        assert(err2.code == KafkaWire.ErrOutOfOrderSequence)
      } finally c.close()
    }
  }

  test("idempotent client: append() sequences end to end; foreign pids pass through") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port, idempotent = true)
      try {
        c.createTopic("auto", 2)
        val b1 = c.append("auto", 0,
          (0 until 7).map(i => Broker.Record(null, s"a$i".getBytes)))
        val b2 = c.append("auto", 0,
          (0 until 3).map(i => Broker.Record(null, s"b$i".getBytes)))
        assert(b1 == 0L && b2 == 7L)
        assert(c.endOffset("auto", 0) == 10L)
        // a MIRRORED batch carrying a pid this broker never issued
        // appends verbatim (the raw-passthrough migration path keeps
        // the source cluster's producer ids)
        val foreign = KafkaWire.encodeBatch(
          Seq(Broker.Stored(0, 0L, null, "m".getBytes, Map.empty, 1L)),
          producerId = 999999L, producerEpoch = 3, baseSequence = 57)
        assert(c.appendRawBatches("auto", 0, foreign) == 10L)
        assert(c.fetch("auto", 0, 0L, 11L).size == 11)
      } finally c.close()
    }
  }

  test("transactional client: commit, abort-on-failure, zombie fenced mid-txn") {
    withServer { srv =>
      val tc = new KafkaWire.Client("127.0.0.1", srv.port,
        transactionalId = Some("job"))
      val cc = new KafkaWire.Client("127.0.0.1", srv.port,
        isolation = "read_committed")
      // a second connection posing as the FIRST attempt of the same
      // task (same per-task tid "job-0") that hangs mid-transaction
      val zombie = new KafkaWire.Client("127.0.0.1", srv.port)
      try {
        tc.createTopic("t", 1)
        def recs(ss: String*) = ss.map(s => Broker.Record(null, s.getBytes))
        def committedValues = cc.fetch("t", 0, 0L, 1000L).toVector
          .map(r => new String(r.value))
        // happy path: the session wraps append in
        // AddPartitionsToTxn → produce → EndTxn(commit)
        tc.transactional("t", 0) { tc.append("t", 0, recs("a", "b")) }
        assert(committedValues == Seq("a", "b"))
        // a throwing body aborts: its rows stay behind an abort marker
        val boom = intercept[RuntimeException] {
          tc.transactional("t", 0) {
            tc.append("t", 0, recs("x1", "x2"))
            throw new RuntimeException("task died")
          }
        }
        assert(boom.getMessage == "task died")
        assert(committedValues == Seq("a", "b"),
          "read_committed never sees the aborted attempt")
        assert(tc.fetch("t", 0, 0L, 1000L).toVector.map(r =>
          new String(r.value)) == Seq("a", "b", "x1", "x2"),
          "read_uncommitted sees aborted data (markers skipped by decode)")
        // the retry commits exactly once
        tc.transactional("t", 0) { tc.append("t", 0, recs("c")) }
        assert(committedValues == Seq("a", "b", "c"))
        // zombie: first attempt opens a txn and HANGS (no EndTxn, no
        // abort). The retry's InitProducerId must bump the epoch,
        // abort the dangling txn, and fence the zombie's next moves.
        val (zpid, zep) = zombie.initProducerId("job-0")
        zombie.addPartitionsToTxn("job-0", zpid, zep, Seq(("t", 0)))
        zombie.appendRawBatches("t", 0, KafkaWire.encodeBatch(
          Seq(Broker.Stored(0, 0L, null, "zzz".getBytes, Map.empty, 1L)),
          producerId = zpid, producerEpoch = zep, baseSequence = 0,
          attrsExtra = 0x10))
        assert(cc.endOffset("t", 0) < tc.endOffset("t", 0),
          "the hung txn pins the LSO below the hwm")
        tc.transactional("t", 0) { tc.append("t", 0, recs("d")) }
        assert(committedValues == Seq("a", "b", "c", "d"),
          "re-init aborted the zombie's dangling txn — 'zzz' never commits")
        assert(cc.endOffset("t", 0) == tc.endOffset("t", 0),
          "LSO released: nothing stays open")
        // the zombie is fenced on produce AND on EndTxn
        val fencedProduce = intercept[KafkaWire.WireError] {
          zombie.appendRawBatches("t", 0, KafkaWire.encodeBatch(
            Seq(Broker.Stored(0, 0L, null, "z2".getBytes, Map.empty, 1L)),
            producerId = zpid, producerEpoch = zep, baseSequence = 1,
            attrsExtra = 0x10))
        }
        assert(fencedProduce.code == KafkaWire.ErrInvalidProducerEpoch)
        val fencedEnd = intercept[KafkaWire.WireError] {
          zombie.endTxn("job-0", zpid, zep, commit = true)
        }
        assert(fencedEnd.code == KafkaWire.ErrInvalidProducerEpoch)
      } finally { tc.close(); cc.close(); zombie.close() }
    }
  }

  test("transactions: abort-heavy log stays correct and keeps no range state") {
    withServer { srv =>
      val c = new KafkaWire.Client("127.0.0.1", srv.port,
        transactionalId = Some("churn"))
      val cc = new KafkaWire.Client("127.0.0.1", srv.port,
        isolation = "read_committed")
      try {
        c.createTopic("heavy", 1)
        // 200 transactions, 3 of every 4 aborted, interleaved with
        // plain records — the flag-at-abort design means the broker
        // keeps NO per-abort state, so read_committed fetch cost does
        // not grow with abort count (the old range list grew forever
        // and was scanned per batch)
        val kept = scala.collection.mutable.ArrayBuffer.empty[String]
        (0 until 200).foreach { i =>
          if (i % 4 == 0) {
            c.transactional("heavy", 0) {
              c.append("heavy", 0, Seq(
                Broker.Record(null, s"keep$i".getBytes)))
            }
            kept += s"keep$i"
          } else {
            intercept[RuntimeException] {
              c.transactional("heavy", 0) {
                c.append("heavy", 0, Seq(
                  Broker.Record(null, s"drop$i".getBytes)))
                throw new RuntimeException("abort")
              }
            }
          }
        }
        val got = cc.fetch("heavy", 0, 0L, 100000L).toVector
          .map(r => new String(r.value))
        assert(got == kept.toVector,
          s"read_committed sees exactly the 50 committed rows, got ${got.size}")
        assert(cc.endOffset("heavy", 0) == c.endOffset("heavy", 0),
          "no txn left open after 200 end-to-end transactions")
        // mid-log window reads stay exact too (the committedOnly scan
        // is per-entry flag checks, not a range-list walk)
        val mid = cc.fetch("heavy", 0, 100L, 300L).toVector
        assert(mid.forall(r => new String(r.value).startsWith("keep")))
      } finally { c.close(); cc.close() }
    }
  }

  test("transactions: an idle transaction expires, releasing the LSO") {
    // timing runs on the SEAM clock (no sleeps): the spec advances it
    // past transaction.timeout.ms and the next read_committed request
    // runs the expiry sweep deterministically
    val nowMs = new java.util.concurrent.atomic.AtomicLong(1000000L)
    val srv = new KafkaWire.Server(joinDelayMs = 80,
      clock = () => nowMs.get())
    try {
      val c = new KafkaWire.Client("127.0.0.1", srv.port)
      val cc = new KafkaWire.Client("127.0.0.1", srv.port,
        isolation = "read_committed")
      try {
        c.createTopic("exp", 1)
        c.append("exp", 0, Seq(Broker.Record(null, "plain".getBytes)))
        // a transaction with a 150 ms transaction.timeout.ms that
        // writes one batch and then goes silent
        val (pid, ep) = c.initProducerId("exp-tx", txnTimeoutMs = 150)
        c.addPartitionsToTxn("exp-tx", pid, ep, Seq(("exp", 0)))
        c.appendRawBatches("exp", 0, KafkaWire.encodeBatch(
          Seq(Broker.Stored(0, 0L, null, "hung".getBytes, Map.empty, 1L)),
          producerId = pid, producerEpoch = ep, baseSequence = 0,
          attrsExtra = 0x10))
        assert(cc.endOffset("exp", 0) == 1L, "open txn pins the LSO")
        // under the timeout: still open
        nowMs.addAndGet(100L)
        assert(cc.endOffset("exp", 0) == 1L,
          "txn under transaction.timeout.ms stays open")
        nowMs.addAndGet(100L) // 200 ms total > 150 ms timeout
        // the expiry sweep runs on the read_committed path: the broker
        // aborts the hung txn, writes the marker, and the LSO advances
        assert(cc.endOffset("exp", 0) == 3L,
          "expired txn aborted broker-side (data + marker below the LSO)")
        assert(cc.fetch("exp", 0, 0L, 10L).toVector.map(r =>
          new String(r.value)) == Seq("plain"))
        // the timed-out producer was fenced by the expiry's epoch bump
        val fenced = intercept[KafkaWire.WireError] {
          c.endTxn("exp-tx", pid, ep, commit = true)
        }
        assert(fenced.code == KafkaWire.ErrInvalidProducerEpoch)
      } finally { c.close(); cc.close() }
    } finally srv.stop()
  }
}
