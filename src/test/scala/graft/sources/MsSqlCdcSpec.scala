package graft.sources

import graft.SparkSpec
import graft.sources.MsSqlCdc._

/** microsoft_sql_server_cdc contracts: LSN window boundaries,
  * operation codes, change ordering, poller resume — run for real
  * against embedded Derby through the dialect seam
  * (replication/stream.go behaviors re-asserted, no code ported).
  */
class MsSqlCdcSpec extends SparkSpec {

  private val t = TableRef("shop", "items")

  private def freshDb(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mssqlspec")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE SHOP_ITEMS (id BIGINT, name VARCHAR(32), qty INT)")
    st.execute("CREATE TABLE CDC_SHOP_ITEMS_CT (START_LSN VARCHAR(20), " +
      "SEQVAL VARCHAR(20), OPERATION INT, COMMAND_ID INT, " +
      "id BIGINT, name VARCHAR(32), qty INT)")
    st.close(); conn.close()
    url
  }

  private def addChange(url: String, lsn: String, op: Int, cmd: Int,
                        id: Long, name: String, qty: Int): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    val ps = conn.prepareStatement(
      "INSERT INTO CDC_SHOP_ITEMS_CT VALUES (?, ?, ?, ?, ?, ?, ?)")
    ps.setString(1, lsn); ps.setString(2, lsn); ps.setInt(3, op)
    ps.setInt(4, cmd); ps.setLong(5, id); ps.setString(6, name)
    ps.setInt(7, qty); ps.executeUpdate()
    ps.close(); conn.close()
  }

  private def lsn(n: Int): String = f"$n%020x"

  test("window is exclusive of the cursor, inclusive of the ceiling") {
    val url = freshDb()
    addChange(url, lsn(1), 2, 0, 1, "a", 1)
    addChange(url, lsn(2), 2, 0, 2, "b", 2)
    addChange(url, lsn(3), 2, 0, 3, "c", 3)
    val w = changes(spark, url, t, Some(lsn(1)), lsn(2), DerbyDialect)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(w == Set(2L), "(lsn1, lsn2] must contain exactly lsn2's row")
  }

  test("operation codes map to the reference's metadata values") {
    val url = freshDb()
    addChange(url, lsn(1), 2, 0, 1, "a", 1)
    addChange(url, lsn(2), 3, 0, 1, "a", 1)  // update_before old image
    addChange(url, lsn(2), 4, 1, 1, "a", 9)  // update_after new image
    addChange(url, lsn(3), 1, 0, 1, "a", 9)
    val ops = changes(spark, url, t, None, lsn(3), DerbyDialect)
      .select("operation", "__op", "qty").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(ops == Set(
      ("insert", "c", 1), ("update_before", "ub", 1),
      ("update_after", "u", 9), ("delete", "d", 9)))
  }

  test("changes order by (start_lsn, command_id, operation) in the dialect SQL") {
    // the reference's exact text (stream.go:117) must survive in the
    // mssql dialect: bracket-quoted CT columns, NOLOCK, triple ORDER BY
    val q = MsSqlDialect.windowQuery(t, ZeroLsn, "ff")
    assert(q.contains("FROM cdc.shop_items_CT WITH (NOLOCK)"))
    assert(q.contains("[__$start_lsn] > 0x" + ZeroLsn))
    assert(q.contains("[__$start_lsn] <= 0xff"))
    assert(q.endsWith(
      "ORDER BY [__$start_lsn] ASC, [__$command_id] ASC, [__$operation] ASC"))
    assert(MsSqlDialect.maxLsnQuery(Seq(t)) == "SELECT sys.fn_cdc_get_max_lsn()")
  }

  test("maxLsn is None before any change exists") {
    val url = freshDb()
    assert(maxLsn(url, Seq(t), DerbyDialect).isEmpty)
    addChange(url, lsn(7), 2, 0, 1, "a", 1)
    assert(maxLsn(url, Seq(t), DerbyDialect).contains(lsn(7)))
  }

  test("currentState folds snapshot + changes with delete/update semantics") {
    val url = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    val ps = conn.prepareStatement("INSERT INTO SHOP_ITEMS VALUES (?, ?, ?)")
    Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 3)).foreach { case (i, n, q) =>
      ps.setLong(1, i); ps.setString(2, n); ps.setInt(3, q); ps.executeUpdate()
    }
    ps.close(); conn.close()
    addChange(url, lsn(1), 3, 0, 2, "b", 2)
    addChange(url, lsn(1), 4, 1, 2, "b", 22) // update qty 2 → 22
    addChange(url, lsn(2), 1, 0, 3, "c", 3)  // delete id 3
    addChange(url, lsn(3), 2, 0, 4, "d", 4)  // insert id 4
    val state = currentState(spark, url, t, Seq("id"), lsn(3), DerbyDialect)
      .select("id", "name", "qty").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(state == Set((1L, "a", 1), (2L, "b", 22), (4L, "d", 4)))
  }

  test("config form: microsoft_sql_server_cdc with snapshot over a jdbc url") {
    val url = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    val ps = conn.prepareStatement("INSERT INTO SHOP_ITEMS VALUES (?, ?, ?)")
    ps.setLong(1, 1L); ps.setString(2, "a"); ps.setInt(3, 1); ps.executeUpdate()
    ps.close(); conn.close()
    addChange(url, lsn(1), 2, 0, 2, "b", 2)
    val config =
      s"""input:
         |  microsoft_sql_server_cdc:
         |    connection_string: "$url"
         |    stream_snapshot: true
         |    include: [ "shop.items" ]
         |output:
         |  memory: { name: mssql_cdc_out }
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    val rows = spark.table("mssql_cdc_out").collect()
    assert(rows.length == 2)
    val byOp = rows.map { r =>
      val meta = r.getMap[String, String](r.fieldIndex("metadata"))
      (meta("operation"), meta("table"), meta("lsn"))
    }.toSet
    assert(byOp == Set(("read", "items", ZeroLsn),
      ("insert", "items", lsn(1))))
  }

  test("poller: cursor advances to the ceiling and resumes without re-emission") {
    val url = freshDb()
    val p = poller(url, Seq(t), DerbyDialect)
    assert(p(None) == (Vector.empty, None)) // empty engine: no movement
    addChange(url, lsn(1), 2, 0, 1, "a", 1)
    addChange(url, lsn(2), 3, 0, 1, "a", 1)
    addChange(url, lsn(2), 4, 1, 1, "a", 5)
    val (batch1, c1) = p(None)
    assert(c1.contains(lsn(2)))
    assert(batch1.map(_._2("operation")) ==
      Vector("insert", "update_before", "update_after"))
    assert(batch1.head._2("table") == "items")
    assert(batch1.head._2("lsn") == lsn(1))
    // no new changes: cursor holds, nothing re-emits
    assert(p(c1) == (Vector.empty, c1))
    // append past the cursor: only the new window drains
    addChange(url, lsn(3), 1, 0, 1, "a", 5)
    val (batch2, c2) = p(c1)
    assert(c2.contains(lsn(3)))
    assert(batch2.map(_._2("operation")) == Vector("delete"))
  }
}
