package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for `twitter_search` against
  * [[Twitter.InMemoryServer]]: the client-credentials token exchange,
  * since_id cursor progress, the stale-since_id reset path, and the
  * config-runner form.
  */
class TwitterSpec extends SparkSpec {
  import Twitter.InMemoryServer._

  private def tweets(n: Int): Seq[Tweet] =
    (0 until n).map(i => Tweet(1000 + i, s"t$i"))

  test("first sweep backfills and persists the newest id") {
    val store = new Cursors.MemStore
    val t = Transport(tweets(5))
    val df = Twitter.searchRead(spark, "q", "k", "s", client = t,
      cursor = Some((store, "last_tweet_id")))
    val got = df.select(get_json_object(col("value"), "$.id")).collect()
      .map(_.getString(0).toLong).toSet
    assert(got == (1000L until 1005L).toSet)
    assert(store.get("last_tweet_id").contains("1004"))
  }

  test("since_id sweep emits only newer tweets and advances") {
    val store = new Cursors.MemStore
    Twitter.searchRead(spark, "q", "k", "s", client = Transport(tweets(3)),
      cursor = Some((store, "c")))
    assert(Twitter.searchRead(spark, "q", "k", "s",
      client = Transport(tweets(3)), cursor = Some((store, "c")))
      .count() == 0)
    val got = Twitter.searchRead(spark, "q", "k", "s",
        client = Transport(tweets(6)), cursor = Some((store, "c")))
      .select(get_json_object(col("value"), "$.text")).collect()
      .map(_.getString(0)).toSet
    assert(got == Set("t3", "t4", "t5"))
    assert(store.get("c").contains("1005"))
  }

  test("overflow sweep walks next_token pages before advancing the cursor") {
    // 250 matches > one 100-tweet page: the sweep must drain all pages
    // (the single-page form would skip 150 tweets forever, since the
    // cursor advances to the newest id)
    val store = new Cursors.MemStore
    val t = Transport(tweets(250))
    val df = Twitter.searchRead(spark, "q", "k", "s", client = t,
      cursor = Some((store, "c")))
    val got = df.select(get_json_object(col("value"), "$.id")).collect()
      .map(_.getString(0).toLong).toSet
    assert(got == (1000L until 1250L).toSet, "every page's tweets emitted")
    assert(store.get("c").contains("1249"))
    // next sweep from the advanced cursor is empty
    assert(Twitter.searchRead(spark, "q", "k", "s",
      client = Transport(tweets(250)), cursor = Some((store, "c")))
      .count() == 0)
  }

  test("a stale since_id clears the cursor and skips the sweep") {
    val store = new Cursors.MemStore
    store.set("c", "10") // below the fake's retention floor
    val df = Twitter.searchRead(spark, "q", "k", "s",
      client = Transport(tweets(3), retentionFloor = 500L),
      cursor = Some((store, "c")))
    assert(df.count() == 0)
    assert(store.get("c").contains(""), "cursor must be cleared")
  }

  test("search must use the exchanged bearer token") {
    // a client that refuses the exchange → the read fails before search
    val noToken: graft.operators.Http.Client = reqs => reqs.map(_ =>
      graft.operators.Http.Response(403, """{"errors":[{"message":"nope"}]}"""))
    intercept[IllegalStateException] {
      Twitter.searchRead(spark, "q", "k", "s", client = noToken)
    }
  }

  test("config runner: twitter_search with a file-cache cursor") {
    val name = "tw_" + java.util.UUID.randomUUID.toString.take(8)
    Twitter.registerClient(name, Transport(tweets(4)))
    val dir = java.nio.file.Files.createTempDirectory("tw_cache").toString
    def run() = graft.config.Pipeline.run(spark,
      s"""input:
         |  twitter_search:
         |    query: "spark lang:en"
         |    api_key: k
         |    api_secret: s
         |    cache: twcache
         |    base_url: mem://$name
         |pipeline:
         |  processors: []
         |cache_resources:
         |  - label: twcache
         |    file:
         |      directory: $dir
         |""".stripMargin)
    assert(run().count() == 4)
    assert(run().count() == 0, "second run must resume from since_id")
  }
}
