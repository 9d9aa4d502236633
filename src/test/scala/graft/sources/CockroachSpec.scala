package graft.sources

import graft.SparkSpec
import graft.sources.Cockroach._

/** cockroachdb_changefeed contracts: statement text discipline,
  * backfill-vs-resume cursor semantics, the message shape, and the
  * poller's no-re-emission guarantee.
  */
class CockroachSpec extends SparkSpec {

  test("statement: UPDATED forced, user CURSOR stripped under a cursor cache") {
    assert(statement(Seq("t1", "t2"), Nil, None, managed = false) ==
      "EXPERIMENTAL CHANGEFEED FOR t1, t2")
    assert(statement(Seq("t1"), Seq("DIFF"), None, managed = false) ==
      "EXPERIMENTAL CHANGEFEED FOR t1 WITH DIFF")
    // managed: user cursor option dropped, UPDATED + explicit CURSOR set
    assert(statement(Seq("t1"), Seq("""CURSOR="9"""", "DIFF"),
      Some("123.0"), managed = true) ==
      """EXPERIMENTAL CHANGEFEED FOR t1 WITH DIFF, UPDATED, CURSOR="123.0"""")
    assert(statement(Seq("t1"), Nil, None, managed = true) ==
      "EXPERIMENTAL CHANGEFEED FOR t1 WITH UPDATED")
  }

  test("no cursor: full backfill of latest state; cursor: strictly-newer only") {
    val cluster = new MemCluster
    cluster.upsert("t", "[1]", """{"k":1,"v":"a"}""")
    val ts2 = cluster.upsert("t", "[2]", """{"k":2,"v":"b"}""")
    cluster.upsert("t", "[1]", """{"k":1,"v":"a2"}""") // replaces key 1
    val backfill = cluster.feed(
      statement(Seq("t"), Nil, None, managed = true))
    assert(backfill.size == 2, "latest value per key, not full history")
    assert(backfill.find(_._2 == "[1]").get._3.contains("\"v\":\"a2\""))
    // resume after ts2: only key 1's later rewrite qualifies
    val resumed = cluster.feed(
      statement(Seq("t"), Nil, Some(ts2), managed = true))
    assert(resumed.map(_._2) == Seq("[1]"))
  }

  test("read: reference message shape and persisted max cursor") {
    val cluster = new MemCluster
    cluster.upsert("t", "[7]", """{"k":7}""")
    val store = new Cursors.MemStore()
    val out = Cockroach.read(spark, cluster.feed, Seq("t"),
      cursorStore = store).collect()
    assert(out.length == 1)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val msg = mapper.readTree(out.head.getString(0))
    assert(msg.path("table").asText == "t")
    assert(msg.path("primary_key").asText == "[7]")
    val row = mapper.readTree(msg.path("row").asText)
    assert(row.path("after").path("k").asInt == 7)
    val cursor = store.get(CursorCacheKey)
    assert(cursor.contains(row.path("updated").asText))
    // a second read with the persisted cursor delivers nothing new
    assert(Cockroach.read(spark, cluster.feed, Seq("t"),
      cursorStore = store).count() == 0)
  }

  test("poller: cursor rides the offset; appended changes drain incrementally") {
    val cluster = new MemCluster
    cluster.upsert("t", "[1]", """{"k":1}""")
    val p = Cockroach.poller(cluster.feed, Seq("t"))
    val (b1, c1) = p(None)
    assert(b1.size == 1)
    assert(p(c1)._1.isEmpty)
    cluster.upsert("t", "[2]", """{"k":2}""")
    val (b2, c2) = p(c1)
    assert(b2.size == 1)
    assert(c2 != c1)
  }
}
