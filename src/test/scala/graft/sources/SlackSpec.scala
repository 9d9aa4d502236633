package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for `slack_users` / `slack_post` against
  * [[Slack.InMemoryServer]] (cursor-paged users.list, team filtering,
  * chat.postMessage recording with ok=false envelopes).
  */
class SlackSpec extends SparkSpec {
  import Slack.InMemoryServer._

  private def users(n: Int): Seq[User] =
    (0 until n).map(i => User(f"U$i%03d", if (i % 2 == 0) "T1" else "T2",
      s"user$i", s"User $i"))

  test("users.list walks the cursor chain in page order") {
    val t = Transport(users(7), pageSize = 3)
    val df = Slack.usersRead(spark, "xoxb-test", limit = 3,
      baseUrl = "mem://x", client = t)
    val got = df.orderBy("__seq")
      .select(get_json_object(col("value"), "$.id")).collect()
      .map(_.getString(0)).toSeq
    assert(got == (0 until 7).map(i => f"U$i%03d"))
  }

  test("team_id filters server-side") {
    val t = Transport(users(6))
    val got = Slack.usersRead(spark, "xoxb-test", teamId = "T2",
        client = t, baseUrl = "mem://x")
      .select(get_json_object(col("value"), "$.id")).collect()
      .map(_.getString(0)).toSet
    assert(got == Set("U001", "U003", "U005"))
  }

  test("ok=false fails the read loudly") {
    val bad: graft.operators.Http.Client = reqs => reqs.map(_ =>
      graft.operators.Http.Response(200,
        """{"ok":false,"error":"invalid_auth"}"""))
    val e = intercept[IllegalStateException] {
      Slack.usersRead(spark, "bad", client = bad, baseUrl = "mem://x")
    }
    assert(e.getMessage.contains("invalid_auth"))
  }

  test("slack_post posts one message per row and checks the ok envelope") {
    import spark.implicits._
    // the write runs executor-side: a directly-passed transport would
    // be SERIALIZED into the task closure and record into a copy — the
    // mem:// registry late-binds by name so tasks hit the driver's
    // instance in local mode (the same reason the seam exists)
    val name = "slackw_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(Nil)
    Slack.registerClient(name, t)
    val df = Seq(("C1", "hello"), ("C2", "world")).toDF("ch", "txt")
    Slack.postWrite(df.repartition(1).sortWithinPartitions("ch"),
      "xoxb-test", channelId = col("ch"), text = col("txt"),
      baseUrl = s"mem://$name")
    val posts = t.posted.iterator().asScala.toSeq.sortBy(_.channel)
    assert(posts.map(p => (p.channel, p.text)) ==
      Seq(("C1", "hello"), ("C2", "world")))
    assert(posts.forall(_.ts.nonEmpty))

    // empty channel → ok=false → the write must fail
    val e = intercept[IllegalStateException] {
      Slack.postWrite(Seq(("", "x")).toDF("ch", "txt"), "xoxb-test",
        channelId = col("ch"), text = col("txt"),
        baseUrl = s"mem://$name")
    }
    assert(e.getMessage.contains("rejected"))
  }

  test("slack_post blocks render as a real JSON array, not a string") {
    import spark.implicits._
    val name = "slackb_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(Nil)
    Slack.registerClient(name, t)
    val blocks =
      """[{"type":"section","text":{"type":"mrkdwn","text":"*hi*"}}]"""
    Slack.postWrite(Seq(("C1", blocks)).toDF("ch", "blk"), "xoxb-test",
      channelId = col("ch"), blocksJson = col("blk"),
      baseUrl = s"mem://$name")
    val posts = t.posted.iterator().asScala.toSeq
    assert(posts.size == 1)
    // the server rejects string-typed blocks with invalid_blocks, so a
    // recorded post proves the wire shape was a nested array; assert the
    // content round-tripped structurally too
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(m.readTree(posts.head.blocksJson) == m.readTree(blocks))
  }

  test("text and blocks are mutually exclusive") {
    import spark.implicits._
    val df = Seq(("C1", "x")).toDF("ch", "txt")
    intercept[IllegalArgumentException] {
      Slack.postWrite(df, "t", channelId = col("ch"),
        text = col("txt"), blocksJson = col("txt"),
        client = Transport(Nil))
    }
    intercept[IllegalArgumentException] {
      Slack.postWrite(df, "t", channelId = col("ch"),
        client = Transport(Nil))
    }
  }

  test("slack_reaction reacts to recorded posts and rejects unknown ones") {
    import spark.implicits._
    val name = "slackr_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(Nil)
    Slack.registerClient(name, t)
    Slack.postWrite(Seq(("C1", "hello")).toDF("ch", "txt"), "xoxb",
      channelId = col("ch"), text = col("txt"), baseUrl = s"mem://$name")
    val ts = t.posted.peek().ts
    Slack.reactionWrite(Seq(("C1", ts, "tada")).toDF("ch", "ts", "emoji"),
      "xoxb", channelId = col("ch"), timestamp = col("ts"),
      emoji = col("emoji"), baseUrl = s"mem://$name")
    assert(t.reactions.iterator().asScala.toSeq ==
      Seq(("add", "C1", ts, "tada")))
    // unknown timestamp → ok=false → fail
    intercept[IllegalStateException] {
      Slack.reactionWrite(
        Seq(("C1", "0.0", "x")).toDF("ch", "ts", "emoji"), "xoxb",
        channelId = col("ch"), timestamp = col("ts"), emoji = col("emoji"),
        baseUrl = s"mem://$name")
    }
    // bad action rejected up-front
    intercept[IllegalArgumentException] {
      Slack.reactionWrite(
        Seq(("C1", ts, "x")).toDF("ch", "ts", "emoji"), "xoxb",
        channelId = col("ch"), timestamp = col("ts"), emoji = col("emoji"),
        action = "toggle", baseUrl = s"mem://$name")
    }
  }

  test("config runner: slack_users input → slack_post output") {
    val name = "slack_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(users(4))
    Slack.registerClient(name, t)
    val df = graft.config.Pipeline.run(spark,
      s"""input:
         |  slack_users:
         |    bot_token: xoxb-demo
         |    base_url: mem://$name
         |pipeline:
         |  processors: []
         |output:
         |  slack_post:
         |    bot_token: xoxb-demo
         |    base_url: mem://$name
         |    channel_id: "C-$${!this.team_id}"
         |    text: "hi $${!this.name}"
         |""".stripMargin)
    assert(df.count() == 4)
    val posts = t.posted.iterator().asScala.toSeq
    assert(posts.map(_.channel).toSet == Set("C-T1", "C-T2"))
    assert(posts.map(_.text).toSet ==
      (0 until 4).map(i => s"hi user$i").toSet)
  }
}
