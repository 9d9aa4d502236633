package graft.sinks

import graft.SparkSpec

/** Warehouse streaming-sink contracts:
  *
  *   - gcp_bigquery load jobs (multipart jobs.insert + poll-to-DONE):
  *     disposition semantics, job atomicity, per-partition batching;
  *   - snowflake_streaming (Snowpipe Streaming REST): channel open /
  *     client-sequencer fencing / offset-token exactly-once.
  */
class WarehouseSinksSpec extends SparkSpec {

  private def fresh(p: String): String =
    p + "_" + java.util.UUID.randomUUID.toString.replace("-", "").take(10)

  // ───────────────────────── bigquery ─────────────────────────

  test("bigquery: append load jobs land rows atomically after the " +
       "poll reaches DONE; per-partition batches all arrive") {
    val name = fresh("bq")
    val svc = BigQuery.serviceFor(name)
    val df = spark.range(40).selectExpr(
      """concat('{"id":', id, '}') AS value""").repartition(4)
    BigQuery.write(df,
      BigQuery.Conf("p1", "ds", "events"), s"mem://$name", batchSize = 8)
    val rows = svc.rows("ds", "events")
    assert(rows.size == 40)
    assert(rows.toSet == (0 until 40).map(i => s"""{"id":$i}""").toSet)
  }

  test("bigquery: WRITE_TRUNCATE replaces the table in one job; " +
       "WRITE_EMPTY fails against a non-empty table WITHOUT mutating; " +
       "CREATE_NEVER fails when the table is absent") {
    val name = fresh("bq")
    val svc = BigQuery.serviceFor(name)
    def df(n: Int, tag: String) = spark.range(n).selectExpr(
      s"""concat('{"$tag":', id, '}') AS value""").repartition(3)
    BigQuery.write(df(10, "a"),
      BigQuery.Conf("p1", "ds", "t"), s"mem://$name")
    assert(svc.rows("ds", "t").size == 10)
    // truncate replaces — even though the source had 3 partitions,
    // the sink forces ONE job so the final state is the whole batch
    BigQuery.write(df(7, "b"),
      BigQuery.Conf("p1", "ds", "t", writeDisposition = "WRITE_TRUNCATE"),
      s"mem://$name")
    assert(svc.rows("ds", "t").size == 7)
    assert(svc.rows("ds", "t").forall(_.contains("\"b\"")))
    // WRITE_EMPTY on non-empty: the job fails and contributes nothing
    intercept[org.apache.spark.SparkException] {
      BigQuery.write(df(5, "c"),
        BigQuery.Conf("p1", "ds", "t", writeDisposition = "WRITE_EMPTY"),
        s"mem://$name")
    }
    assert(svc.rows("ds", "t").size == 7, "failed job is atomic")
    // CREATE_NEVER against a missing table
    intercept[org.apache.spark.SparkException] {
      BigQuery.write(df(5, "d"),
        BigQuery.Conf("p1", "ds", "missing",
          createDisposition = "CREATE_NEVER"), s"mem://$name")
    }
    assert(svc.rows("ds", "missing").isEmpty)
    // ... but succeeds once the table exists
    svc.createTable("ds", "pre")
    BigQuery.write(df(3, "e"),
      BigQuery.Conf("p1", "ds", "pre",
        createDisposition = "CREATE_NEVER"), s"mem://$name")
    assert(svc.rows("ds", "pre").size == 3)
  }

  test("bigquery: CSV format prepends the configured header per batch") {
    val name = fresh("bq")
    val svc = BigQuery.serviceFor(name)
    val df = spark.range(4).selectExpr("concat(id, ',x') AS value")
      .coalesce(1)
    BigQuery.write(df,
      BigQuery.Conf("p1", "ds", "csvt", format = "CSV",
        csvHeader = Seq("id", "v")), s"mem://$name")
    val rows = svc.rows("ds", "csvt")
    assert(rows.head == "id,v", "header line first")
    assert(rows.size == 5)
  }

  // ─────────────────────── snowflake streaming ───────────────────────

  test("snowpipe: offset tokens give exactly-once across a re-send; " +
       "channel status exposes the committed frontier") {
    val name = fresh("sp")
    val svc = Snowpipe.serviceFor(name)
    def df() = spark.range(30).selectExpr(
      """concat('{"n":', id, '}') AS value""",
      "lpad(cast(id AS string), 8, '0') AS __offset_token")
      .coalesce(1)
    Snowpipe.write(df(), s"mem://$name", "db", "public", "events",
      channelPrefix = "ch", batchSize = 10)
    assert(svc.rows("db", "public", "events").size == 30)
    assert(svc.committedToken("db", "public", "events", "ch-0")
      .contains("00000029"))
    // a full re-send (restart replay) must not duplicate anything
    Snowpipe.write(df(), s"mem://$name", "db", "public", "events",
      channelPrefix = "ch", batchSize = 10)
    assert(svc.rows("db", "public", "events").size == 30,
      "tokens ≤ committed are duplicates and must be dropped")
    // a partial overlap delivers only the tail
    val more = spark.range(50).selectExpr(
      """concat('{"n":', id, '}') AS value""",
      "lpad(cast(id AS string), 8, '0') AS __offset_token")
      .coalesce(1)
    Snowpipe.write(more, s"mem://$name", "db", "public", "events",
      channelPrefix = "ch", batchSize = 10)
    assert(svc.rows("db", "public", "events").size == 50)
    val status = Snowpipe.channelStatus(s"mem://$name",
      svc.client, "db", "public", "events", Seq("ch-0"))
    assert(status("ch-0").contains("00000049"))
  }

  test("snowpipe: a newer open fences the older writer's sequencer") {
    val name = fresh("sp")
    val svc = Snowpipe.serviceFor(name)
    val c = svc.client
    val w1 = Snowpipe.openChannel(s"mem://$name", c, "db", "s", "t", "ch")
    val w2 = Snowpipe.openChannel(s"mem://$name", c, "db", "s", "t", "ch")
    assert(w2.clientSequencer > w1.clientSequencer)
    // the new writer lands data
    assert(Snowpipe.writeBlob(s"mem://$name", c, "db", "s", "t", w2,
      Seq("""{"x":1}"""), "00000000", "00000000"))
    // the fenced writer is rejected loudly
    intercept[IllegalStateException] {
      Snowpipe.writeBlob(s"mem://$name", c, "db", "s", "t", w1,
        Seq("""{"x":2}"""), "00000001", "00000001")
    }
    assert(svc.rows("db", "s", "t").size == 1,
      "the fenced writer contributed nothing")
  }
}
