package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** spicedb_watch contract (internal/impl/spicedb/watch_input.go):
  * Watch RPC over real h2c gRPC, zed-token cursor resume via the
  * cache file, proto round-trip, bearer auth.
  */
class SpiceDbSpec extends SparkSpec {

  test("watch replays updates after the cursor with tokens and ops intact") {
    val srv = new SpiceDb.Server("sdb-token")
    try {
      srv.publish("TOUCH", "document", "d1", "viewer", "user", "alice")
      srv.publish("CREATE", "document", "d2", "viewer", "user", "bob")
      srv.publish("DELETE", "document", "d1", "viewer", "user", "alice")
      val got = SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token",
        startCursor = Some("zed-0")).collect().sortBy(_.seq)
      assert(got.map(_.op).toSeq == Seq("TOUCH", "CREATE", "DELETE"))
      assert(got.head.resourceType == "document" &&
        got.head.resourceId == "d1" && got.head.relation == "viewer" &&
        got.head.subjectType == "user" && got.head.subjectId == "alice")
      assert(got.map(_.zedToken).toSeq == Seq("zed-1", "zed-2", "zed-3"))
    } finally srv.stop()
  }

  test("cache file resume: second watch sees only post-checkpoint updates") {
    val srv = new SpiceDb.Server("sdb-token")
    try {
      val cache = Files.createTempFile("zed", ".token").toString
      srv.publish("TOUCH", "doc", "a", "viewer", "user", "u1")
      val r1 = SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token",
        cachePath = Some(cache), startCursor = Some("zed-0")).collect()
      assert(r1.length == 1)
      srv.publish("TOUCH", "doc", "b", "viewer", "user", "u2")
      val r2 = SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token",
        cachePath = Some(cache)).collect()
      assert(r2.length == 1 && r2.head.resourceId == "b",
        "resumed from the cached zed token — no replay")
      val r3 = SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token",
        cachePath = Some(cache)).collect()
      assert(r3.isEmpty)
    } finally srv.stop()
  }

  test("streamed admission spills beyond admitChunk (bounded driver heap)") {
    val srv = new SpiceDb.Server("sdb-token")
    try {
      (1 to 137).foreach(i => srv.publish("TOUCH", "doc", s"d$i",
        "viewer", "user", s"u$i"))
      val got = SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token",
        startCursor = Some("zed-0"), admitChunk = 40).collect()
      assert(got.length == 137)
      assert(got.map(_.zedToken).distinct.length == 137, "no loss/dupes")
      assert(SpiceDb.lastAdmissionChunks >= 3,
        s"137 updates at admitChunk=40 must spill " +
          s"(${SpiceDb.lastAdmissionChunks})")
      SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token",
        startCursor = Some("zed-0")).collect()
      assert(SpiceDb.lastAdmissionChunks == 1, "fast path stays in memory")
    } finally srv.stop()
  }

  test("no cursor means 'from now'; bad bearer token is UNAUTHENTICATED") {
    val srv = new SpiceDb.Server("sdb-token")
    try {
      srv.publish("TOUCH", "doc", "old", "viewer", "user", "u")
      val now = SpiceDb.watch(spark, "127.0.0.1", srv.port, "sdb-token")
        .collect()
      assert(now.isEmpty, "watch without a cursor starts at 'now'")
      val e = intercept[IllegalStateException] {
        SpiceDb.watch(spark, "127.0.0.1", srv.port, "WRONG",
          startCursor = Some("zed-0")).collect()
      }
      assert(e.getMessage.contains("grpc-status 16"))
    } finally srv.stop()
  }
}
