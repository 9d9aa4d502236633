package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.PgOutput._
import graft.sources.PgOutput.Fixture._

/** pgoutput wire-decoder contract tests against fixture byte streams
  * built by the independent [[PgOutput.Fixture]] encoder: the published
  * logical-replication message formats, the TYPES.md delivery matrix,
  * tuple kinds (null / unchanged-toast / text), relation re-definition
  * mid-stream, the replication framing, and the relational apply.
  */
class PgOutputSpec extends SparkSpec {

  private val Rel = 16384L
  private val T0 = 757382400000000L // pg micros ≈ 2024-01-01T00:00:00Z

  private def frames(msgs: Array[Byte]*): Seq[Array[Byte]] =
    msgs.zipWithIndex.map { case (m, i) => xlog(1000L + i * 100, T0, m) }

  // every row of the TYPES.md matrix, one column each
  private val matrixCols = Seq(
    (1, "c_bool", OidBool, -1), (0, "c_int2", OidInt2, -1),
    (0, "c_int4", OidInt4, -1), (0, "c_int8", OidInt8, -1),
    (0, "c_float4", OidFloat4, -1), (0, "c_float8", OidFloat8, -1),
    (0, "c_numeric", OidNumeric, -1), (0, "c_text", OidText, -1),
    (0, "c_varchar", OidVarchar, -1), (0, "c_bytea", OidBytea, -1),
    (0, "c_date", OidDate, -1), (0, "c_time", OidTime, -1),
    (0, "c_timetz", OidTimetz, -1), (0, "c_ts", OidTimestamp, -1),
    (0, "c_tstz", OidTimestamptz, -1), (0, "c_uuid", OidUuid, -1),
    (0, "c_jsonb", OidJsonb, -1), (0, "c_custom", 99999, -1))

  private val matrixVals = Seq(
    VText("t"), VText("7"), VText("42"), VText("9000000000"),
    VText("1.5"), VText("2.25"), VText("123.4500"), VText("hi"),
    VText("vc"), VText("\\x0a1b2c"), VText("2024-03-05"),
    VText("13:14:15.123456"), VText("13:14:15+02"),
    VText("2024-03-05 13:14:15.123456"),
    VText("2024-03-05 13:14:15.123456+02"),
    VText("550e8400-e29b-41d4-a716-446655440000"),
    VText("""{"a":[1,2]}"""), VText("custom-text"))

  test("TYPES.md matrix: schema types and decoded values") {
    val fs = frames(
      begin(5000L, T0, 7),
      relation(Rel, "public", "t_all", 'd', matrixCols),
      insert(Rel, matrixVals),
      commit(5000L, 5001L, T0))
    val df = typedChanges(spark, fs, "t_all")
    val s = df.schema
    def tpe(n: String) = s(n).dataType
    assert(tpe("c_bool") == BooleanType)
    assert(tpe("c_int2") == IntegerType, "int2 promotes to Int32")
    assert(tpe("c_int4") == IntegerType && tpe("c_int8") == LongType)
    assert(tpe("c_float4") == FloatType && tpe("c_float8") == DoubleType)
    assert(tpe("c_numeric") == StringType, "numeric stays a string")
    assert(tpe("c_bytea") == BinaryType)
    assert(tpe("c_date") == TimestampType, "DATE maps to Timestamp")
    assert(tpe("c_time") == StringType && tpe("c_timetz") == StringType)
    assert(tpe("c_ts") == TimestampType && tpe("c_tstz") == TimestampType)
    assert(tpe("c_uuid") == StringType && tpe("c_jsonb") == StringType)
    assert(tpe("c_custom") == StringType, "unknown OID falls back to text")

    val r = df.collect().head
    assert(r.getAs[Boolean]("c_bool"))
    assert(r.getAs[Int]("c_int2") == 7 && r.getAs[Int]("c_int4") == 42)
    assert(r.getAs[Long]("c_int8") == 9000000000L)
    assert(r.getAs[Float]("c_float4") == 1.5f)
    assert(r.getAs[Double]("c_float8") == 2.25)
    assert(r.getAs[String]("c_numeric") == "123.4500",
      "numeric preserves the raw text (scale included)")
    assert(r.getAs[Array[Byte]]("c_bytea").toSeq ==
      Seq(0x0a, 0x1b, 0x2c).map(_.toByte))
    assert(r.getAs[java.sql.Timestamp]("c_date").toInstant.toString ==
      "2024-03-05T00:00:00Z")
    assert(r.getAs[String]("c_time") == "13:14:15.123456")
    assert(r.getAs[String]("c_timetz") == "13:14:15+02",
      "timetz keeps the raw text (the reference's string(data) fallback)")
    assert(r.getAs[java.sql.Timestamp]("c_ts").toInstant.toString ==
      "2024-03-05T13:14:15.123456Z")
    assert(r.getAs[java.sql.Timestamp]("c_tstz").toInstant.toString ==
      "2024-03-05T11:14:15.123456Z", "timestamptz honors the offset")
    assert(r.getAs[String]("c_uuid") ==
      "550e8400-e29b-41d4-a716-446655440000")
    assert(r.getAs[String]("c_jsonb") == """{"a":[1,2]}""")
    assert(r.getAs[String]("c_custom") == "custom-text")
    assert(r.getAs[String]("__op") == "c")
  }

  test("nulls and ±infinity dates/timestamps deliver SQL NULL") {
    val cols = Seq((0, "a", OidInt4, -1), (0, "d", OidDate, -1),
      (0, "ts", OidTimestamp, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "t", 'd', cols),
      insert(Rel, Seq(VNull, VText("infinity"), VText("-infinity"))),
      commit(1L, 2L, T0))
    val r = typedChanges(spark, fs, "t").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("update forms: bare, key old-tuple, full old-tuple with toast fallback") {
    val cols = Seq((1, "id", OidInt4, -1), (0, "blob", OidText, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "t", 'f', cols),
      insert(Rel, Seq(VText("1"), VText("big-toasted-value"))),
      // bare update (no old tuple)
      update(Rel, None, Seq(VText("1"), VText("v2"))),
      // REPLICA IDENTITY FULL: old tuple carries the real value for the
      // new tuple's unchanged-toast column
      update(Rel, Some(('O', Seq(VText("1"), VText("v2")))),
        Seq(VText("1"), VToast)),
      // key-only old tuple: toast has NO fallback → stays null
      update(Rel, Some(('K', Seq(VText("1"), VNull))),
        Seq(VText("1"), VToast)),
      commit(1L, 2L, T0))
    val rows = typedChanges(spark, fs, "t").orderBy("__lsn").collect()
    assert(rows.length == 4)
    assert(rows(1).getString(1) == "v2")
    assert(rows(2).getString(1) == "v2",
      "unchanged toast resolves against the full old tuple")
    assert(rows(3).isNullAt(1),
      "no fallback for key-only old tuples — toast delivers null")
    assert(rows.drop(1).forall(_.getAs[String]("__op") == "u"))
  }

  test("delete delivers the old image with op=d") {
    val cols = Seq((1, "id", OidInt8, -1), (0, "v", OidText, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "t", 'd', cols),
      insert(Rel, Seq(VText("5"), VText("x"))),
      delete(Rel, 'K', Seq(VText("5"), VNull)),
      commit(1L, 2L, T0))
    val rows = typedChanges(spark, fs, "t").orderBy("__lsn").collect()
    assert(rows(1).getLong(0) == 5L && rows(1).getAs[String]("__op") == "d")
  }

  test("relation re-definition mid-stream rebinds subsequent changes") {
    val v1 = Seq((1, "id", OidInt4, -1))
    val v2 = Seq((1, "id", OidInt4, -1), (0, "added", OidText, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "t", 'd', v1),
      insert(Rel, Seq(VText("1"))),
      relation(Rel, "public", "t", 'd', v2), // schema changed
      insert(Rel, Seq(VText("2"), VText("new"))),
      commit(1L, 2L, T0))
    // typedChanges uses the LAST relation definition for the frame
    val df = typedChanges(spark, fs, "t")
    assert(df.schema.fieldNames.take(2).toSeq == Seq("id", "added"))
    val rows = df.orderBy("__lsn").collect()
    assert(rows(1).getInt(0) == 2 && rows(1).getString(1) == "new")
  }

  test("keepalives, origin, type, logical messages and truncate are transparent") {
    val cols = Seq((1, "id", OidInt4, -1))
    val fs = Seq(
      keepalive(999L, T0, replyRequested = true),
      xlog(1000L, T0, begin(1L, T0, 1)),
      xlog(1100L, T0, origin(1L, "node-a")),
      xlog(1200L, T0, typeMsg(77777L, "public", "mood")),
      xlog(1300L, T0, relation(Rel, "public", "t", 'd', cols)),
      xlog(1400L, T0, logicalMsg(transactional = true, 1L, "wal2json",
        "payload".getBytes("UTF-8"))),
      xlog(1500L, T0, insert(Rel, Seq(VText("1")))),
      xlog(1600L, T0, truncate(0, Seq(Rel))),
      xlog(1700L, T0, commit(1L, 2L, T0)),
      keepalive(1800L, T0, replyRequested = false))
    val rows = typedChanges(spark, fs, "t").collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 1)
  }

  test("stream (protocol v2) envelopes parse") {
    assert(parse(new Fx().streamStart(42L, first = true)) ==
      StreamStart(42L, firstSegment = true))
    assert(parse(Array[Byte]('E'.toByte)) == StreamStop)
  }
  // encode the two v2 envelopes the Fixture object doesn't expose
  private final class Fx {
    def streamStart(xid: Long, first: Boolean): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(6)
      b.put('S'.toByte).putInt(xid.toInt)
        .put((if (first) 1 else 0).toByte)
      b.array()
    }
  }

  test("begin/commit fields decode (LSN, pg-epoch time, xid)") {
    parse(begin(0x123456789AL, T0, 99)) match {
      case Begin(lsn, micros, xid) =>
        assert(lsn == 0x123456789AL && micros == T0 && xid == 99L)
        assert(lsnString(lsn) == "12/3456789A")
      case other => fail(s"expected Begin, got $other")
    }
    parse(commit(10L, 20L, T0)) match {
      case Commit(flags, c, e, m) =>
        assert(flags == 0 && c == 10L && e == 20L && m == T0)
      case other => fail(s"expected Commit, got $other")
    }
    assert(pgMicrosToUnixMicros(T0) / 1000000L == 1704067200L,
      "pg epoch offset lands on 2024-01-01T00:00:00Z")
  }

  test("malformed streams fail loudly") {
    intercept[IllegalArgumentException] {
      parse(Array[Byte]('Z'.toByte, 0, 0))
    }
    intercept[IllegalStateException] {
      // change before any RELATION message
      decodeChanges(frames(begin(1L, T0, 1),
        insert(Rel, Seq(VText("1")))))
    }
    intercept[IllegalArgumentException] {
      parseFrame(Array[Byte]('q'.toByte, 1, 2))
    }
  }

  test("envelope form emits the StreamMessage JSON shape") {
    val cols = Seq((1, "id", OidInt4, -1), (0, "name", OidText, -1),
      (0, "raw", OidBytea, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "users", 'd', cols),
      insert(Rel, Seq(VText("1"), VText("a\"b"), VText("\\x00ff"))),
      commit(1L, 2L, T0))
    val r = changes(spark, fs).collect().head
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(r.getString(0))
    assert(node.path("operation").asText == "insert")
    assert(node.path("schema").asText == "public")
    assert(node.path("table").asText == "users")
    assert(node.path("data").path("id").asInt == 1)
    assert(node.path("data").path("name").asText == "a\"b")
    assert(node.path("data").path("raw").asText == "AP8=",
      "bytea marshals as base64 in the JSON form")
    val m = r.getMap[String, String](1)
    assert(m("table") == "users" && m("operation") == "insert")
    assert(m("lsn").matches("[0-9A-F]+/[0-9A-F]+"))
  }

  test("config runner: postgres_cdc replays a recorded wal_file") {
    val cols = Seq((1, "id", OidInt4, -1), (0, "v", OidText, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "t", 'd', cols),
      insert(Rel, Seq(VText("1"), VText("a"))),
      insert(Rel, Seq(VText("2"), VText("b"))),
      delete(Rel, 'K', Seq(VText("1"), VNull)),
      commit(1L, 2L, T0))
    val f = java.nio.file.Files.createTempFile("pgcdc", ".wal").toString
    writeFrameFile(f, fs)
    assert(readFrameFile(f).map(_.toSeq) == fs.map(_.toSeq),
      "frame file round-trips byte-exactly")
    val df = graft.config.Pipeline.run(spark,
      s"""input:
         |  postgres_cdc:
         |    wal_file: $f
         |pipeline:
         |  processors: []
         |""".stripMargin)
    val rows = df.orderBy("__seq").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getMap[String, String](1)("operation")).toSeq ==
      Seq("insert", "insert", "delete"))
    assert(rows.head.getString(0).contains(""""table":"t""""))
  }

  test("WAL replay + latestState materializes the final relational state") {
    val cols = Seq((1, "id", OidInt4, -1), (0, "v", OidText, -1))
    val fs = frames(
      begin(1L, T0, 1),
      relation(Rel, "public", "t", 'd', cols),
      insert(Rel, Seq(VText("1"), VText("a"))),
      insert(Rel, Seq(VText("2"), VText("b"))),
      insert(Rel, Seq(VText("3"), VText("c"))),
      commit(1L, 2L, T0),
      begin(3L, T0 + 1000000, 2),
      update(Rel, None, Seq(VText("2"), VText("b2"))),
      delete(Rel, 'K', Seq(VText("3"), VNull)),
      commit(3L, 4L, T0 + 1000000))
    val state = Cdc.latestState(
      typedChanges(spark, fs, "t"), Seq("id"), col("__lsn"))
      .drop("__lsn").orderBy("id").collect()
    assert(state.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b2")))
  }

  /** A long synthetic stream: `n` single-insert transactions at
    * strictly increasing LSNs, with a mid-stream ALTER (a second
    * RELATION version adding a column) after `alterAt` when set.
    */
  private def longStream(n: Int, alterAt: Int = -1): Seq[Array[Byte]] = {
    val v1 = Seq((1, "id", OidInt4, -1), (0, "v", OidText, -1))
    val v2 = v1 :+ ((0, "extra", OidText, -1))
    val out = Seq.newBuilder[Array[Byte]]
    var lsn = 1000L
    def emit(m: Array[Byte]): Unit = { out += xlog(lsn, T0, m); lsn += 10 }
    emit(relation(Rel, "public", "t", 'd', v1))
    (0 until n).foreach { i =>
      if (i == alterAt) emit(relation(Rel, "public", "t", 'd', v2))
      emit(begin(lsn, T0 + i.toLong * 1000, i.toLong + 1))
      val vals =
        if (alterAt >= 0 && i >= alterAt)
          Seq(VText(i.toString), VText(s"v$i"), VText(s"e$i"))
        else Seq(VText(i.toString), VText(s"v$i"))
      emit(insert(Rel, vals))
      emit(commit(lsn, lsn + 1, T0 + i.toLong * 1000))
    }
    out.result()
  }

  /** Iterable that PROVES single-pass consumption: a second iterator()
    * request throws.
    */
  private final class OnePass(fs: Seq[Array[Byte]])
      extends Iterable[Array[Byte]] {
    private var used = false
    def iterator: Iterator[Array[Byte]] = {
      require(!used, "stream iterated twice — admission is not one-pass")
      used = true
      fs.iterator
    }
  }

  test("typed replay larger than the admission chunk spills in bounded " +
       "chunks, one pass, and matches the eager decode") {
    val n = 1000
    val fs = longStream(n, alterAt = 600)
    val df = typedChanges(spark, new OnePass(fs), "t", admitChunk = 128)
    assert(PgOutput.lastAdmissionChunks >= n / 128,
      s"expected ≥ ${n / 128} spill chunks, got " +
        s"${PgOutput.lastAdmissionChunks} — the stream was materialized")
    val rows = df.orderBy("__lsn").collect()
    assert(rows.length == n)
    assert(df.schema.fieldNames.take(3).toSeq == Seq("id", "v", "extra"),
      "final relation version is the result schema")
    // pre-ALTER rows align by name with null for the added column
    assert(rows.take(600).forall(_.isNullAt(2)))
    assert(rows.drop(600).forall(r => r.getString(2) == s"e${r.getInt(0)}"))
    assert(rows.map(_.getInt(0)).toSeq == (0 until n))
  }

  test("envelope replay spills beyond the admission chunk and " +
       "round-trips through parquet identically") {
    val n = 500
    val fs = longStream(n)
    val spilled = PgOutput.changes(spark, new OnePass(fs), admitChunk = 64)
      .orderBy("__seq").collect()
    assert(PgOutput.lastAdmissionChunks >= n / 64)
    val inMem = PgOutput.changes(spark, fs).orderBy("__seq").collect()
    assert(PgOutput.lastAdmissionChunks == 1)
    assert(spilled.map(_.getString(0)).toSeq ==
      inMem.map(_.getString(0)).toSeq)
    assert(spilled.map(_.getMap[String, String](1)("lsn")).toSeq ==
      inMem.map(_.getMap[String, String](1)("lsn")).toSeq)
  }

  test("fromLsn resumes past applied changes while rebuilding schema " +
       "state from the stream head") {
    val fs = longStream(100)
    val all = typedChanges(spark, fs, "t").orderBy("__lsn").collect()
    val mid = all(49).getLong(3) // __lsn is field 3 (id, v, __op, __lsn)
    val resumed = typedChanges(spark, fs, "t", fromLsn = mid)
      .orderBy("__lsn").collect()
    assert(resumed.length == 50)
    assert(resumed.map(_.getInt(0)).toSeq == (50 until 100),
      "resume delivers exactly the changes past the cursor")
  }

  test("streaming poller: cursor IS the LSN — sweeps drain the stream " +
       "without duplicates and a restart re-polls from the committed " +
       "cursor") {
    val fs = longStream(100)
    val p = PgOutput.poller(fs, chunk = 32)
    // sweep to exhaustion from a cold start
    var cursor: Option[String] = None
    val seen = Vector.newBuilder[String]
    var sweeps = 0
    var done = false
    while (!done) {
      val (rows, next) = p(cursor)
      if (rows.isEmpty) done = true
      else {
        seen ++= rows.map(_._1); cursor = next; sweeps += 1
        assert(rows.size <= 33, "sweeps are chunk-bounded")
      }
    }
    assert(sweeps >= 3)
    val ids = seen.result().map(v =>
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(v)
        .get("data").get("id").asInt)
    assert(ids == (0 until 100), "exhaustive drain, stream order, no dups")
    // restart: replay from a mid-stream committed cursor only
    val (s1, c1) = p(None)
    val (s2, _) = p(c1) // "crashed" after committing c1 — re-poll
    val (s2again, _) = p(c1)
    assert(s2.map(_._1) == s2again.map(_._1),
      "re-polling the same committed cursor re-delivers the same sweep")
    assert(s1.map(_._1).toSet.intersect(s2.map(_._1).toSet).isEmpty,
      "no overlap across committed cursors")
  }

  test("poller feeds the PollStream source: checkpointed restart " +
       "resumes from the committed mid-stream LSN with no re-emission") {
    val fs = longStream(60)
    // phase 1 serves a TRUNCATED recording (relation + first 50 txs);
    // the full stream "arrives" only after the restart — the committed
    // LSN in the checkpoint must position phase 2 exactly at tx 50
    val fsHead = fs.take(1 + 50 * 3)
    val name = "pgwal_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val ckpt = java.nio.file.Files
      .createTempDirectory("pg_stream_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("pg_stream_out").toString
    def start() = spark.readStream
      .format("graft.sources.PollSourceProvider")
      .option("poller", name).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      PollStream.register(name, PgOutput.poller(fsHead, chunk = 25))
      val q1 = start()
      q1.processAllAvailable(); q1.stop()
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      def ids(): Seq[Int] = spark.read.parquet(out)
        .select("value").collect()
        .map(r => m.readTree(r.getString(0)).get("data").get("id").asInt)
        .toSeq.sorted
      assert(ids() == (0 until 50), "phase 1 drained the recorded head")
      PollStream.register(name, PgOutput.poller(fs, chunk = 25))
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      assert(ids() == (0 until 60),
        "restart resumed from the committed LSN: the tail exactly " +
        "once, nothing re-emitted")
    } finally PollStream.drop(name)
  }
}
