package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming poll-loop contract for cursor-bearing SaaS inputs
  * ([[PollStream]] + [[Jira.issuesPoller]]): one incremental sweep per
  * micro-batch, offset = cursor (committed through Spark's checkpoint
  * WAL), append-while-running delivers new issues exactly once, a
  * restarted query resumes from the committed cursor with no
  * re-emission, and a logged-but-lost batch re-polls from the
  * committed start cursor (at-least-once recovery).
  */
class PollStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "poll_" + java.util.UUID.randomUUID.toString.replace("-", "")

  private def issue(k: Int, minute: Int): Jira.InMemoryServer.Issue =
    Jira.InMemoryServer.Issue(key = f"POL-$k%04d", project = "P",
      updatedMs = 1700000000000L + minute * 60000L, summary = "")

  /** A jira poller whose corpus can grow while the stream runs. */
  private def growablePoller(corpus: () => Seq[Jira.InMemoryServer.Issue])
      : PollStream.Poller =
    Jira.issuesPoller("https://x.test", Jira.Auth("bot@x.test", "tok"),
      client = reqs => Jira.InMemoryServer.Transport(corpus())(reqs))

  test("append-while-running: new issues appear in a later trigger, " +
       "each exactly once") {
    val name = fresh()
    @volatile var corpus = (0 until 30).map(issue(_, 0))
    PollStream.register(name, growablePoller(() => corpus))
    val q = spark.readStream.format("graft.sources.PollSourceProvider")
      .option("poller", name).load()
      .select(col("metadata")("jira_id").as("id"),
        col("metadata")("jira_event_type").as("t"))
      .writeStream.format("memory").queryName("poll_run")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("poll_run").count() == 30)
      corpus = corpus ++ (30 until 75).map(issue(_, 10))
      q.processAllAvailable()
      val ids = spark.table("poll_run").select("id").as[String]
        .collect().toSeq.sorted
      assert(ids == (0 until 75).map(k => f"POL-$k%04d"),
        s"expected each issue exactly once, got ${ids.size}")
    } finally q.stop()
  }

  test("restart resumes from the committed cursor: no re-emission, " +
       "new issues picked up") {
    val name = fresh()
    @volatile var corpus = (0 until 20).map(issue(_, 0))
    PollStream.register(name, growablePoller(() => corpus))
    val ck = java.nio.file.Files.createTempDirectory("poll_ck").toString
    val out = java.nio.file.Files.createTempDirectory("poll_out").toString
    def start() =
      spark.readStream.format("graft.sources.PollSourceProvider")
        .option("poller", name).load()
        .select(col("metadata")("jira_id").as("id"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 20)
    // grows while NO query runs; the restart must deliver exactly the
    // tail (cursor from the checkpoint, not from any in-memory state)
    corpus = corpus ++ (20 until 50).map(issue(_, 10))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(out).select("id").as[String]
        .collect().toSeq.sorted
      assert(ids == (0 until 50).map(k => f"POL-$k%04d"),
        s"restart must emit exactly the new tail once, got ${ids.size}")
    } finally q2.stop()
  }

  test("seen-map suppression rides the offset: an unchanged issue " +
       "inside the overlap window is not re-emitted") {
    val name = fresh()
    // all issues share one minute: every sweep's JQL threshold
    // re-matches all of them; only the cursor's seen-map suppresses
    @volatile var corpus = (0 until 5).map(issue(_, 0))
    PollStream.register(name, growablePoller(() => corpus))
    val q = spark.readStream.format("graft.sources.PollSourceProvider")
      .option("poller", name).load()
      .select(col("metadata")("jira_id").as("id"))
      .writeStream.format("memory").queryName("poll_seen")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      corpus = corpus ++ Seq(issue(5, 0)) // same minute, new key
      q.processAllAvailable()
      val ids = spark.table("poll_seen").select("id").as[String]
        .collect().toSeq.sorted
      assert(ids == (0 until 6).map(k => f"POL-$k%04d"),
        "boundary-sharing issues must be suppressed by the seen-map")
    } finally q.stop()
  }

  test("crash recovery: a logged-but-lost batch re-polls from the " +
       "committed start cursor") {
    val name = fresh()
    val corpus = (0 until 12).map(issue(_, 0))
    PollStream.register(name, growablePoller(() => corpus))
    val s1 = new PollStream.PollMicroBatchStream(name, parallelism = 2)
    val start = s1.initialOffset()
    val end = s1.latestOffset(start, s1.getDefaultReadLimit)
    assert(end.asInstanceOf[PollStream.PollOffset].sweep == 1)
    // the offset hit the WAL but the driver died: a FRESH stream
    // instance has no pending buffer, only the logged offsets
    val s2 = new PollStream.PollMicroBatchStream(name, parallelism = 2)
    val endR = s2.deserializeOffset(end.json())
    val parts = s2.planInputPartitions(s2.initialOffset(), endR)
    val rows = parts.flatMap(
      _.asInstanceOf[PollStream.PollChunk].rows.map(_._2("jira_id")))
    assert(rows.sorted.toSeq == (0 until 12).map(k => f"POL-$k%04d"),
      "replanned batch must re-fetch the sweep from the start cursor")
  }

  test("discord poller: append-while-running delivers new messages " +
       "exactly once, cursor = newest id") {
    val name = fresh()
    def msg(i: Int) = Discord.InMemoryServer.Msg(
      id = 1000L + i, channelId = "ch1", content = s"m$i",
      authorId = "u1")
    @volatile var corpus = (0 until 25).map(msg)
    PollStream.register(name,
      Discord.poller("ch1", "tok", limit = 10,
        client = reqs => Discord.InMemoryServer.Transport(corpus)(reqs)))
    val q = spark.readStream.format("graft.sources.PollSourceProvider")
      .option("poller", name).load()
      .select(col("metadata")("discord_message_id").as("id"))
      .writeStream.format("memory").queryName("discord_poll")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("discord_poll").count() == 25)
      corpus = corpus ++ (25 until 40).map(msg)
      q.processAllAvailable()
      val ids = spark.table("discord_poll").select("id").as[String]
        .collect().map(_.toLong).sorted.toSeq
      assert(ids == (0 until 40).map(1000L + _),
        "each message exactly once across sweeps")
    } finally q.stop()
  }

  test("twitter poller: append-while-running via since_id; a stale " +
       "cursor self-heals through the backfill window") {
    val name = fresh()
    def tw(i: Int) = Twitter.InMemoryServer.Tweet(5000L + i, s"t$i")
    // one live transport (the token is minted per instance); corpus
    // and retention mutate in place between triggers
    @volatile var transport =
      Twitter.InMemoryServer.Transport((0 until 30).map(tw))
    PollStream.register(name,
      Twitter.poller("graft", "k", "s",
        client = reqs => transport(reqs),
        nowMs = () => 1700000000000L))
    val q = spark.readStream.format("graft.sources.PollSourceProvider")
      .option("poller", name).load()
      .select(col("metadata")("twitter_id").as("id"))
      .writeStream.format("memory").queryName("twitter_poll")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("twitter_poll").count() == 30)
      transport = Twitter.InMemoryServer.Transport((0 until 45).map(tw))
      q.processAllAvailable()
      val ids = spark.table("twitter_poll").select("id").as[String]
        .collect().map(_.toLong).sorted.toSeq
      assert(ids == (0 until 45).map(5000L + _),
        "since_id pagination delivers each tweet exactly once")
      // retention floor moves past the cursor: the next sweep is
      // rejected as stale, resets the cursor (an EMPTY sweep that
      // still commits), then the following sweep re-enters via the
      // backfill window
      transport = Twitter.InMemoryServer.Transport(
        (0 until 45).map(tw) :+ tw(1000), retentionFloor = 6000L)
      q.processAllAvailable() // stale sweep: cursor reset, no rows
      q.processAllAvailable() // backfill sweep picks up from scratch
      val after = spark.table("twitter_poll").select("id").as[String]
        .collect().map(_.toLong).sorted.toSeq
      assert(after.last == 6000L,
        "self-healed sweep delivers the post-reset tweet")
    } finally q.stop()
  }

  test("config runner: the streaming poll/discord input forms build " +
       "running queries over registered transports") {
    // generic poll form
    val name = fresh()
    val corpus = (0 until 8).map(issue(_, 0))
    PollStream.register(name, growablePoller(() => corpus))
    val q1 = graft.config.Pipeline.runStream(spark,
      s"""input:
         |  poll:
         |    poller: $name
         |pipeline:
         |  processors: []
         |output:
         |  memory:
         |    name: cfg_poll_out
         |""".stripMargin)
    try {
      q1.processAllAvailable()
      assert(spark.table("cfg_poll_out").count() == 8)
    } finally q1.stop()

    // discord streaming form (mem:// registered client)
    val cname = "dcfg_" + java.util.UUID.randomUUID.toString.take(8)
    val msgs = (0 until 5).map(i => Discord.InMemoryServer.Msg(
      2000L + i, "chA", s"c$i", "u"))
    Discord.registerClient(cname, Discord.InMemoryServer.Transport(msgs))
    val q2 = graft.config.Pipeline.runStream(spark,
      s"""input:
         |  discord:
         |    channel_id: chA
         |    bot_token: tok
         |    base_url: mem://$cname
         |pipeline:
         |  processors: []
         |output:
         |  memory:
         |    name: cfg_discord_out
         |""".stripMargin)
    try {
      q2.processAllAvailable()
      assert(spark.table("cfg_discord_out").count() == 5)
    } finally q2.stop()
  }
}
