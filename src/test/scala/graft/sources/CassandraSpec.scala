package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CQL native protocol v4 contracts over the loopback server: the
  * STARTUP/READY handshake, typed value encodings round-tripping
  * through bound QUERY values and Rows results, INSERT-is-an-UPSERT
  * keyed semantics, logged batches, ERROR frames surfacing loudly,
  * and the spark input/output components.
  */
class CassandraSpec extends SparkSpec {

  private def fresh(): String =
    "cq_" + java.util.UUID.randomUUID.toString.replace("-", "").take(10)

  test("handshake + typed round-trip through bound values and Rows") {
    val name = fresh()
    val srv = Cassandra.named(name)
    try {
      srv.registerTable("ks", "t", Seq(
        "id" -> "int", "big" -> "bigint", "name" -> "varchar",
        "score" -> "double", "ok" -> "boolean", "at" -> "timestamp"),
        key = Seq("id"))
      val c = Cassandra.clientFor(s"mem://$name")
      try {
        val ts = java.sql.Timestamp.from(
          java.time.Instant.parse("2024-03-05T13:14:15.250Z"))
        c.query(
          "INSERT INTO ks.t (id, big, name, score, ok, at) " +
            "VALUES (?, ?, ?, ?, ?, ?)",
          Seq((Cassandra.CInt, 7), (Cassandra.CBigint, 9000000000L),
            (Cassandra.CVarchar, "alpha"), (Cassandra.CDouble, 2.25),
            (Cassandra.CBoolean, true), (Cassandra.CTimestamp, ts)))
        val (cols, rows) = c.query("SELECT * FROM ks.t")
        assert(cols.map(_._1) ==
          Vector("id", "big", "name", "score", "ok", "at"))
        val r = rows.head
        assert(r(0) == 7 && r(1) == 9000000000L && r(2) == "alpha")
        assert(r(3) == 2.25 && r(4) == true && r(5) == ts)
        // WHERE with a bound value
        val (_, hit) = c.query("SELECT name FROM ks.t WHERE id = ?",
          Seq((Cassandra.CInt, 7)))
        assert(hit == Vector(Vector("alpha")))
        assert(c.query("SELECT name FROM ks.t WHERE id = ?",
          Seq((Cassandra.CInt, 8)))._2.isEmpty)
      } finally c.close()
    } finally Cassandra.drop(name)
  }

  test("INSERT is an UPSERT on the primary key; logged batches apply " +
       "every statement; errors surface as ERROR frames") {
    val name = fresh()
    val srv = Cassandra.named(name)
    try {
      srv.registerTable("ks", "acct", Seq(
        "user" -> "varchar", "bal" -> "int"), key = Seq("user"))
      val c = Cassandra.clientFor(s"mem://$name")
      try {
        val ins = "INSERT INTO ks.acct (user, bal) VALUES (?, ?)"
        c.query(ins, Seq((Cassandra.CVarchar, "a"), (Cassandra.CInt, 1)))
        c.query(ins, Seq((Cassandra.CVarchar, "a"), (Cassandra.CInt, 5)))
        assert(srv.rowCount("ks", "acct") == 1,
          "same key overwrites (Cassandra's defining write behavior)")
        assert(c.query("SELECT bal FROM ks.acct WHERE user = 'a'")._2 ==
          Vector(Vector(5)))
        // logged batch
        c.batch(ins, (0 until 20).map(i =>
          Seq((Cassandra.CVarchar, s"u$i"), (Cassandra.CInt, i))))
        assert(srv.rowCount("ks", "acct") == 21)
        // unknown table → ERROR frame → loud client failure
        intercept[IllegalStateException] {
          c.query("SELECT * FROM ks.nope")
        }
      } finally c.close()
    } finally Cassandra.drop(name)
  }

  test("spark components: per-partition batched output; SELECT input " +
       "emits one typed JSON message per row") {
    val name = fresh()
    val srv = Cassandra.named(name)
    try {
      srv.registerTable("lake", "nums", Seq(
        "n" -> "bigint", "label" -> "varchar", "even" -> "boolean"),
        key = Seq("n"))
      val df = spark.range(100).selectExpr("id AS n",
        "concat('v', id) AS label", "id % 2 = 0 AS even")
        .repartition(4)
      Cassandra.write(df, s"mem://$name",
        "INSERT INTO lake.nums (n, label, even) VALUES (?, ?, ?)",
        argCols = Seq("n" -> "bigint", "label" -> "varchar",
          "even" -> "boolean"),
        batchSize = 16)
      assert(srv.rowCount("lake", "nums") == 100)
      val back = Cassandra.read(spark, s"mem://$name",
        "SELECT n, label, even FROM lake.nums")
      val rows = back.select(
        get_json_object(col("value"), "$.n").cast("long").as("n"),
        get_json_object(col("value"), "$.label").as("label"),
        get_json_object(col("value"), "$.even").cast("boolean")
          .as("even")).orderBy("n").collect()
      assert(rows.length == 100)
      assert(rows.map(_.getLong(0)).toSeq == (0L until 100L))
      assert(rows.forall(r => r.getString(1) == s"v${r.getLong(0)}"))
      assert(rows.forall(r => r.getBoolean(2) == (r.getLong(0) % 2 == 0)))
    } finally Cassandra.drop(name)
  }
}
