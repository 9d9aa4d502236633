package graft.sources

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** gcp_spanner_cdc contract (internal/impl/gcp/enterprise/
  * input_spanner_cdc.go): child partition discovery, data change
  * records with commit-timestamp ordering, watermark resume (data AND
  * heartbeat), mutation → mod_type mapping, auth.
  */
class SpannerCdcSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val db = "projects/p/instances/i/databases/d"

  private def commit(srv: SpannerCdc.Server, mutationsJson: String): Long = {
    val req = java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(s"${srv.baseUrl}/v1/$db/sessions/s1:commit"))
      .header("Authorization", "Bearer spanner-token")
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        s"""{"mutations":$mutationsJson}"""))
      .build()
    val r = java.net.http.HttpClient.newHttpClient().send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200, r.body())
    mapper.readTree(r.body()).get("commitTimestamp").asLong
  }

  private def insertMut(k: Long, v: String) =
    s"""{"insertOrUpdate":{"table":"t","columns":["k","v"],"values":[["$k","$v"]]}}"""

  test("mutations surface as INSERT/UPDATE/DELETE records in commit order") {
    val srv = new SpannerCdc.Server()
    try {
      commit(srv, s"[${insertMut(1, "a")},${insertMut(2, "b")}]")
      commit(srv, s"[${insertMut(1, "A")}]") // second write → UPDATE
      commit(srv, """[{"delete":{"table":"t","keySet":{"keys":[["2"]]}}}]""")
      val evs = SpannerCdc.read(spark, srv.baseUrl, "spanner-token", db,
        "orders_stream").collect().sortBy(e => (e.commitTs, e.recordSequence))
      assert(evs.map(_.modType).toSeq ==
        Seq("INSERT", "INSERT", "UPDATE", "DELETE"))
      val up = evs(2)
      assert(mapper.readTree(up.newValues).get("v").asText == "A")
      assert(mapper.readTree(up.oldValues).get("v").asText == "a")
      val del = evs(3)
      assert(mapper.readTree(del.keys).get("k").asText == "2")
      assert(del.newValues == null)
      // commit timestamps strictly increase across commits
      assert(evs.map(_.commitTs).toSeq == Seq(1L, 1L, 2L, 3L))
    } finally srv.stop()
  }

  test("records fan out across discovered child partitions") {
    val srv = new SpannerCdc.Server(partitions = 3)
    try {
      commit(srv, (1 to 30).map(i => insertMut(i, s"v$i")).mkString("[", ",", "]"))
      val evs = SpannerCdc.read(spark, srv.baseUrl, "spanner-token", db,
        "s").collect()
      assert(evs.length == 30)
      assert(evs.map(_.partitionToken).distinct.sorted.toSeq ==
        Seq("p0", "p1", "p2"), "all partitions discovered via the root query")
      // a key's records always live on the same partition
      assert(evs.groupBy(e => mapper.readTree(e.keys).get("k").asText)
        .forall(_._2.map(_.partitionToken).distinct.size == 1))
    } finally srv.stop()
  }

  test("watermark resume: only new records after a checkpointed read") {
    val srv = new SpannerCdc.Server()
    try {
      val ck = Files.createTempFile("spanner", ".json").toString
      commit(srv, s"[${insertMut(1, "a")}]")
      val r1 = SpannerCdc.read(spark, srv.baseUrl, "spanner-token", db, "s",
        Some(ck)).collect()
      assert(r1.length == 1)
      commit(srv, s"[${insertMut(2, "b")}]")
      val r2 = SpannerCdc.read(spark, srv.baseUrl, "spanner-token", db, "s",
        Some(ck)).collect()
      assert(r2.length == 1 &&
        mapper.readTree(r2.head.newValues).get("k").asText == "2")
      // heartbeat-only read: empty, but the watermark still holds
      val r3 = SpannerCdc.read(spark, srv.baseUrl, "spanner-token", db, "s",
        Some(ck)).collect()
      assert(r3.isEmpty)
    } finally srv.stop()
  }

  test("requests without the bearer token are rejected") {
    val srv = new SpannerCdc.Server()
    try {
      intercept[IllegalStateException] {
        SpannerCdc.read(spark, srv.baseUrl, "WRONG", db, "s").collect()
      }
    } finally srv.stop()
  }
}
