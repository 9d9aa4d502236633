package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Http

/** Contract tests for the `jira` input against [[Jira.InMemoryServer]],
  * the in-memory implementation of the server side of the REST contract
  * the input consumes (token-chained /search/jql pages, minute-truncated
  * `updated >=`, first-page /issue/{key}/comment child fetches).
  */
class JiraSpec extends SparkSpec {
  import Jira.InMemoryServer._

  private val T0 = 1700000000000L // 2023-11-14T22:13:20Z
  private def min(n: Int): Long = T0 + n * 60000L

  private val auth = Jira.Auth("bot@x.test", "tok")

  private def corpus(n: Int): Seq[Issue] =
    (0 until n).map(i => Issue(f"PRJ-$i%03d", "PRJ", min(i), s"s$i"))

  test("paginates the full token chain and emits JQL order with metadata") {
    val t = Transport(corpus(7), pageSize = 3)
    val df = Jira.read(spark, "https://x.test", auth, client = t, pageSize = 3)
    val rows = df.orderBy("__seq").collect()
    assert(rows.length == 7)
    assert(t.searchCalls == 3) // 3+3+1
    val m = rows.head.getMap[String, String](1)
    assert(m("jira_id") == "PRJ-000" && m("jira_project") == "PRJ")
    assert(m("jira_event_type") == "issue")
    assert(m("jira_updated") == "2023-11-14T22:13:20Z")
    assert(!m.contains("jira_issue_key"), "issues omit jira_issue_key")
    assert(rows.map(_.getMap[String, String](1)("jira_id")).toSeq ==
      (0 until 7).map(i => f"PRJ-$i%03d"))
    // body is the raw issue JSON
    assert(rows.head.getString(0).contains(""""key":"PRJ-000""""))
  }

  test("incremental sweep emits only new versions; boundary not re-emitted") {
    val store = new Jira.MemStore
    val first = corpus(5) // minutes 0..4
    val t1 = Transport(first)
    val s1 = Jira.read(spark, "https://x.test", auth, client = t1,
      cursor = Some((store, "cur"))).count()
    assert(s1 == 5)

    // second sweep: nothing changed — threshold re-matches the boundary
    // (cursor - overlap), but seen suppresses every re-match
    val t2 = Transport(first)
    val s2 = Jira.read(spark, "https://x.test", auth, client = t2,
      cursor = Some((store, "cur"))).count()
    assert(s2 == 0, "unchanged corpus must emit nothing")

    // third sweep: one boundary issue got a NEW update + one new issue
    val third = first.updated(4, first(4).copy(updatedMs = min(9))) :+
      Issue("PRJ-900", "PRJ", min(8), "new")
    val t3 = Transport(third)
    val got = Jira.read(spark, "https://x.test", auth, client = t3,
        cursor = Some((store, "cur")))
      .select(col("metadata")("jira_id")).as[String](
        org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(got == Set("PRJ-004", "PRJ-900"),
      s"expected the re-updated boundary issue + the new one, got $got")
  }

  test("cursor JSON survives the file store across reads") {
    val dir = java.nio.file.Files.createTempDirectory("jira_cur").toString
    val store = new Jira.FileStore(dir)
    val t = Transport(corpus(3))
    Jira.read(spark, "https://x.test", auth, client = t,
      cursor = Some((store, "k"))).count()
    val persisted = store.get("k").get
    assert(persisted.contains(""""updated":"2023-11-14T22:15:20Z""""))
    val again = new Jira.FileStore(dir) // fresh instance, same dir
    assert(Jira.read(spark, "https://x.test", auth, client = Transport(corpus(3)),
      cursor = Some((again, "k"))).count() == 0)
  }

  test("comments resource fans out per issue with parent metadata") {
    val issues = Seq(
      Issue("A-1", "A", min(0), "x",
        comments = Seq(Comment("c1", min(1), "hi"), Comment("c2", min(2), "yo"))),
      Issue("A-2", "A", min(3), "y",
        comments = Seq(Comment("c3", min(4), "ok"))))
    val t = Transport(issues)
    val rows = Jira.read(spark, "https://x.test", auth,
      resource = "comments", client = t).orderBy("__seq").collect()
    assert(rows.length == 3)
    val m = rows.head.getMap[String, String](1)
    assert(m("jira_id") == "c1" && m("jira_issue_key") == "A-1")
    assert(m("jira_event_type") == "comment" && m("jira_project") == "A")
    assert(rows.map(_.getMap[String, String](1)("jira_id")).toSeq ==
      Seq("c1", "c2", "c3"))
  }

  test("comments corpus larger than one server page emits the first page") {
    // 60 comments > the server's 50-per-page cap: the first page is
    // emitted (with a truncation warning), executor-side, in order
    val cs = (0 until 60).map(i => Comment(f"c$i%02d", min(i), s"b$i"))
    val t = Transport(Seq(Issue("A-1", "A", min(0), "x", comments = cs)))
    val rows = Jira.read(spark, "https://x.test", auth,
      resource = "comments", client = t).orderBy("__seq").collect()
    assert(rows.length == 50)
    assert(rows.map(_.getMap[String, String](1)("jira_id")).toSeq ==
      (0 until 50).map(i => f"c$i%02d"))
  }

  test("failed comment fetch fails the sweep BEFORE the cursor advances") {
    val issues = Seq(
      Issue("A-1", "A", min(0), "x", comments = Seq(Comment("c1", min(1), "hi"))),
      Issue("A-2", "A", min(2), "y", comments = Seq(Comment("c2", min(3), "yo"))))
    val inner = Transport(issues)
    // child fetches 500 while the search pages succeed
    val failing: Http.Client = reqs => reqs.map { q =>
      if (q.url.contains("/comment")) Http.Response(500, "boom")
      else inner(Seq(q)).head
    }
    val store = new Jira.MemStore
    intercept[Exception] {
      Jira.read(spark, "https://x.test", auth, resource = "comments",
        client = failing, cursor = Some((store, "cur"))).count()
    }
    assert(store.get("cur").isEmpty,
      "cursor must not advance when the comment emission failed")
    // the retry sweep (transport healthy again) delivers everything
    val retried = Jira.read(spark, "https://x.test", auth,
      resource = "comments", client = Transport(issues),
      cursor = Some((store, "cur")))
    assert(retried.count() == 2)
    assert(store.get("cur").nonEmpty, "cursor advances after success")
  }

  test("changelog resource emits embedded first-page histories") {
    val issues = Seq(
      Issue("B-1", "B", min(0), "x",
        changelog = Seq(("h1", min(0)), ("h2", min(1)))),
      Issue("B-2", "B", min(2), "y",
        changelog = Seq(("h3", min(2))), changelogTotal = 120))
    val t = Transport(issues)
    val rows = Jira.read(spark, "https://x.test", auth,
      resource = "changelog", client = t).orderBy("__seq").collect()
    assert(rows.length == 3)
    val m = rows.head.getMap[String, String](1)
    assert(m("jira_id") == "h1" && m("jira_issue_key") == "B-1")
    assert(m("jira_event_type") == "changelog")
  }

  test("config runner form reads through a registered mem:// client") {
    val name = "jira_" + java.util.UUID.randomUUID.toString.take(8)
    Jira.registerClient(name, Transport(corpus(4)))
    val df = graft.config.Pipeline.run(spark,
      s"""input:
         |  jira:
         |    base_url: mem://$name
         |    auth:
         |      email: bot@x.test
         |      api_token: tok
         |    page_size: 2
         |pipeline:
         |  processors: []
         |""".stripMargin)
    assert(df.count() == 4)
    assert(df.selectExpr("metadata['jira_event_type']").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("issue"))
  }

  test("unsupported resource fails loudly") {
    intercept[IllegalArgumentException] {
      Jira.read(spark, "https://x.test", auth, resource = "worklogs",
        client = Transport(Nil))
    }
  }
}
