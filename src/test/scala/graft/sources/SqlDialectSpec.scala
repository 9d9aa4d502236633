package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden SQL text per driver registration (conn_fields.go:30's 12
  * names): placeholders, quoting, LIMIT forms, upsert statements.
  * These are exact-string goldens — a drifted renderer fails loudly.
  */
class SqlDialectSpec extends AnyFunSuite {

  private val cols = Seq("id", "name", "score")
  private val keys = Seq("id")

  test("all 12 reference driver names resolve (plus the derby stand-in)") {
    val refDrivers = Seq("mysql", "postgres", "pgx", "clickhouse", "mssql",
      "sqlite", "oracle", "snowflake", "trino", "gocosmos", "spanner",
      "databricks")
    refDrivers.foreach(d => assert(SqlDialect(d).name == d))
    assert(SqlDialect("derby").name == "derby")
    intercept[IllegalArgumentException](SqlDialect("nope"))
  }

  test("insert: placeholder style per driver (output_sql_insert.go:171)") {
    // squirrel.Dollar drivers
    assert(SqlDialect("postgres").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES ($1, $2, $3)""")
    assert(SqlDialect("pgx").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES ($1, $2, $3)""")
    assert(SqlDialect("clickhouse").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES ($1, $2, $3)""")
    // squirrel.Colon drivers
    assert(SqlDialect("oracle").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES (:1, :2, :3)""")
    assert(SqlDialect("gocosmos").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES (:1, :2, :3)""")
    // Question (default) drivers
    assert(SqlDialect("mysql").insert("t", cols) ==
      "INSERT INTO `t` (`id`, `name`, `score`) VALUES (?, ?, ?)")
    assert(SqlDialect("mssql").insert("t", cols) ==
      "INSERT INTO [t] ([id], [name], [score]) VALUES (?, ?, ?)")
    assert(SqlDialect("sqlite").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES (?, ?, ?)""")
    assert(SqlDialect("snowflake").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES (?, ?, ?)""")
    assert(SqlDialect("trino").insert("t", cols) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES (?, ?, ?)""")
    assert(SqlDialect("spanner").insert("t", cols) ==
      "INSERT INTO `t` (`id`, `name`, `score`) VALUES (?, ?, ?)")
    assert(SqlDialect("databricks").insert("t", cols) ==
      "INSERT INTO `t` (`id`, `name`, `score`) VALUES (?, ?, ?)")
    // derby: unquoted (matches the executable JdbcSpec seam)
    assert(SqlDialect("derby").insert("t", cols) ==
      "INSERT INTO t (id, name, score) VALUES (?, ?, ?)")
  }

  test("insert: prefix / options / suffix hooks (output_sql_insert.go:49-63)") {
    assert(SqlDialect("mysql").insert("t", Seq("id"),
      options = Seq("IGNORE")) ==
      "INSERT IGNORE INTO `t` (`id`) VALUES (?)")
    assert(SqlDialect("mysql").insert("t", Seq("id"),
      prefix = "/* traced */", suffix = "ON DUPLICATE KEY UPDATE id = id") ==
      "/* traced */ INSERT INTO `t` (`id`) VALUES (?) " +
        "ON DUPLICATE KEY UPDATE id = id")
    assert(SqlDialect("postgres").insert("t", Seq("id"),
      suffix = "RETURNING id") ==
      """INSERT INTO "t" ("id") VALUES ($1) RETURNING id""")
  }

  test("select: LIMIT forms (suffix / TOP / FETCH FIRST)") {
    assert(SqlDialect("mysql").select("t", Seq("id"), limit = Some(10)) ==
      "SELECT `id` FROM `t` LIMIT 10")
    assert(SqlDialect("mssql").select("t", Seq("id"), limit = Some(10)) ==
      "SELECT TOP 10 [id] FROM [t]")
    assert(SqlDialect("oracle").select("t", Seq("id"), limit = Some(10)) ==
      """SELECT "id" FROM "t" FETCH FIRST 10 ROWS ONLY""")
    assert(SqlDialect("postgres").select("t", Seq("id", "name"),
      where = Some("score > $1"), orderBy = Seq("id"), limit = Some(5)) ==
      """SELECT "id", "name" FROM "t" WHERE score > $1 ORDER BY "id" LIMIT 5""")
    assert(SqlDialect("trino").select("t", Nil) ==
      """SELECT * FROM "t"""")
  }

  test("upsert: ON CONFLICT (postgres/sqlite)") {
    assert(SqlDialect("postgres").upsert("t", cols, keys) ==
      """INSERT INTO "t" ("id", "name", "score") VALUES ($1, $2, $3) """ +
        """ON CONFLICT ("id") DO UPDATE SET "name" = excluded."name", """ +
        """"score" = excluded."score"""")
    assert(SqlDialect("sqlite").upsert("t", keys, keys) ==
      """INSERT INTO "t" ("id") VALUES (?) ON CONFLICT ("id") DO NOTHING""")
  }

  test("upsert: ON DUPLICATE KEY UPDATE (mysql)") {
    assert(SqlDialect("mysql").upsert("t", cols, keys) ==
      "INSERT INTO `t` (`id`, `name`, `score`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`), " +
        "`score` = VALUES(`score`)")
  }

  test("upsert: MERGE (mssql/oracle/snowflake/spanner/databricks)") {
    assert(SqlDialect("mssql").upsert("t", cols, keys) ==
      "MERGE INTO [t] t USING (SELECT ? AS [id], ? AS [name], ? AS [score]) s " +
        "ON (t.[id] = s.[id]) " +
        "WHEN MATCHED THEN UPDATE SET t.[name] = s.[name], t.[score] = s.[score] " +
        "WHEN NOT MATCHED THEN INSERT ([id], [name], [score]) " +
        "VALUES (s.[id], s.[name], s.[score])")
    assert(SqlDialect("oracle").upsert("t", cols, keys) ==
      """MERGE INTO "t" t USING (SELECT :1 AS "id", :2 AS "name", :3 AS "score" FROM dual) s """ +
        """ON (t."id" = s."id") """ +
        """WHEN MATCHED THEN UPDATE SET t."name" = s."name", t."score" = s."score" """ +
        """WHEN NOT MATCHED THEN INSERT ("id", "name", "score") """ +
        """VALUES (s."id", s."name", s."score")""")
  }

  test("upsert: plain-insert fallbacks (clickhouse/trino have no row upsert)") {
    assert(SqlDialect("clickhouse").upsert("t", cols, keys) ==
      SqlDialect("clickhouse").insert("t", cols))
    assert(SqlDialect("trino").upsert("t", cols, keys) ==
      SqlDialect("trino").insert("t", cols))
  }

  test("quoting escapes embedded quote characters") {
    assert(SqlDialect("mysql").quote("we`ird") == "`we``ird`")
    assert(SqlDialect("postgres").quote("we\"ird") == "\"we\"\"ird\"")
    assert(SqlDialect("mssql").quote("we]ird") == "[we]]ird]")
  }

  test("upsert rejects keys outside the column list") {
    intercept[IllegalArgumentException] {
      SqlDialect("postgres").upsert("t", Seq("a"), Seq("b"))
    }
  }

  test("derby dialect text executes on the embedded seam") {
    // the one dialect with a live engine in this environment: render →
    // prepare → run, proving the rendered text is real SQL, not a toy
    val url = s"jdbc:derby:memory:dialect_spec;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE t (id INT PRIMARY KEY, name VARCHAR(20), score INT)")
      val d = SqlDialect("derby")
      val ins = conn.prepareStatement(d.insert("t", cols))
      ins.setInt(1, 1); ins.setString(2, "a"); ins.setInt(3, 10)
      ins.executeUpdate()
      // stage-then-merge (Derby accepts base-table MERGE sources only)
      conn.createStatement().execute(
        "CREATE TABLE stage (id INT, name VARCHAR(20), score INT)")
      val st = conn.prepareStatement(d.insert("stage", cols))
      Seq((1, "a2", 99), (2, "b", 5)).foreach { case (i, n, sc) =>
        st.setInt(1, i); st.setString(2, n); st.setInt(3, sc)
        st.executeUpdate()
      }
      conn.createStatement()
        .executeUpdate(d.upsertFromTable("t", "stage", cols, keys))
      val rs = conn.createStatement().executeQuery(
        d.select("t", cols, orderBy = Seq("id")))
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toVector
      assert(rows == Vector((1, "a2", 99), (2, "b", 5)))
    } finally conn.close()
  }
}
