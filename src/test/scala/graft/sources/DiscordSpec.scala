package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for the `discord` input/output against
  * [[Discord.InMemoryServer]] (newest-first pages walked forward with
  * `after`, cursor persistence, content wrapping on POST).
  */
class DiscordSpec extends SparkSpec {
  import Discord.InMemoryServer._

  private def corpus(cid: String, n: Int): Seq[Msg] =
    (0 until n).map(i => Msg(100 + i, cid, s"m$i", s"A${i % 2}"))

  test("backfill pages forward and emits oldest-first") {
    val t = Transport(corpus("C1", 7))
    val df = Discord.read(spark, "C1", "tok", client = t, limit = 3)
    val got = df.orderBy("__seq")
      .select(get_json_object(col("value"), "$.content")).collect()
      .map(_.getString(0)).toSeq
    assert(got == (0 until 7).map(i => s"m$i"))
  }

  test("cursor resumes after the last seen id; other channels ignored") {
    val store = new Cursors.MemStore
    val t1 = Transport(corpus("C1", 4) ++ corpus("C2", 2))
    assert(Discord.read(spark, "C1", "tok", client = t1,
      cursor = Some((store, "last_message_id"))).count() == 4)
    // same corpus again → nothing new
    assert(Discord.read(spark, "C1", "tok", client = Transport(corpus("C1", 4)),
      cursor = Some((store, "last_message_id"))).count() == 0)
    // two new messages appended → only those
    val t3 = Transport(corpus("C1", 6))
    val got = Discord.read(spark, "C1", "tok", client = t3,
        cursor = Some((store, "last_message_id")))
      .select(get_json_object(col("value"), "$.content")).collect()
      .map(_.getString(0)).toSet
    assert(got == Set("m4", "m5"))
  }

  test("output wraps raw text as content and posts JSON objects directly") {
    import spark.implicits._
    val name = "dc_" + java.util.UUID.randomUUID.toString.take(8)
    val t = Transport(Nil)
    Discord.registerClient(name, t)
    Discord.write(
      Seq("plain words", """{"content":"structured","tts":false}""")
        .toDF("value").coalesce(1),
      "C9", "tok", baseUrl = s"mem://$name")
    val posts = t.posted.iterator().asScala.toSeq
    assert(posts.length == 2)
    assert(posts.exists(_.contains(""""content":"plain words"""")))
    assert(posts.exists(p => p.contains(""""content":"structured"""") &&
      p.contains(""""tts":false""")))
    assert(posts.forall(_.contains(""""channel_id":"C9"""")))
  }

  test("config runner: discord input with a file-cache cursor") {
    val name = "dci_" + java.util.UUID.randomUUID.toString.take(8)
    Discord.registerClient(name, Transport(corpus("CH", 5)))
    val dir = java.nio.file.Files.createTempDirectory("dc_cache").toString
    def run() = graft.config.Pipeline.run(spark,
      s"""input:
         |  discord:
         |    channel_id: CH
         |    bot_token: tok
         |    cache: dcache
         |    base_url: mem://$name
         |pipeline:
         |  processors: []
         |cache_resources:
         |  - label: dcache
         |    file:
         |      directory: $dir
         |""".stripMargin)
    assert(run().count() == 5)
    assert(run().count() == 0, "second run must resume from the cursor")
  }
}
