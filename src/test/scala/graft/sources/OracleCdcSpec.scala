package graft.sources

import graft.SparkSpec
import graft.sources.OracleCdc._

/** oracledb_cdc contracts: the SQL_REDO parser matrix (the
  * reference's public parser_test.go corpus re-asserted), literal
  * value conversion, XID transaction assembly with rollback, and the
  * low-watermark checkpoint rule.
  */
class OracleCdcSpec extends SparkSpec {

  private def newVals(sql: String): Map[String, Option[String]] =
    SqlRedo.parse(sql).newValues.toMap
  private def oldVals(sql: String): Map[String, Option[String]] =
    SqlRedo.parse(sql).oldValues.toMap

  test("INSERT with quoted identifiers") {
    val e = SqlRedo.parse(
      """insert into "MYAPP"."CUSTOMERS" ("ID","NAME","EMAIL") values ('1','John Doe','john@example.com')""")
    assert(e.op == "insert" && e.schema == "MYAPP" && e.table == "CUSTOMERS")
    assert(e.newValues == Seq("ID" -> Some("1"), "NAME" -> Some("John Doe"),
      "EMAIL" -> Some("john@example.com")))
  }

  test("UPDATE: SET into new values, WHERE into old values") {
    val sql =
      """update "MYAPP"."CUSTOMERS" set "NAME" = 'Jane Doe', "EMAIL" = 'jane@example.com' where "ID" = '1' and "NAME" = 'John Doe'"""
    assert(newVals(sql) == Map("NAME" -> Some("Jane Doe"),
      "EMAIL" -> Some("jane@example.com")))
    assert(oldVals(sql) == Map("ID" -> Some("1"),
      "NAME" -> Some("John Doe")))
  }

  test("DELETE: WHERE into old values") {
    val sql =
      """delete from "MYAPP"."CUSTOMERS" where "ID" = '1' and "NAME" = 'John Doe'"""
    val e = SqlRedo.parse(sql)
    assert(e.op == "delete" && e.newValues.isEmpty)
    assert(oldVals(sql) == Map("ID" -> Some("1"),
      "NAME" -> Some("John Doe")))
  }

  test("doubled-quote string escapes and embedded double quotes") {
    assert(newVals(
      """insert into "MYAPP"."MESSAGES" ("ID","TEXT") values ('1','It''s a test')""")
      == Map("ID" -> Some("1"), "TEXT" -> Some("It's a test")))
    assert(newVals(
      """insert into "MYAPP"."MESSAGES" ("ID","TEXT") values ('1','He said "Hello"')""")
      ("TEXT") == Some("""He said "Hello""""))
  }

  test("function literals survive verbatim; identifiers may hold quotes") {
    assert(newVals(
      """insert into "MYAPP"."ORDERS" ("ID","ORDER_DATE") values ('100',TO_DATE('2020-01-15','YYYY-MM-DD'))""")
      ("ORDER_DATE") == Some("TO_DATE('2020-01-15','YYYY-MM-DD')"))
    val e = SqlRedo.parse(
      """insert into "MYAPP"."O'Brien" ("ID","NAME") values ('1','Alice')""")
    assert(e.table == "O'Brien")
  }

  test("NULL and bare 'Unsupported Type' become absent values") {
    assert(newVals(
      """insert into "MYAPP"."SAMPLES" ("ID","A","B") values ('1',NULL,NULL)""")
      == Map("ID" -> Some("1"), "A" -> None, "B" -> None))
    assert(newVals(
      """insert into "MYAPP"."TEST"("ID","NAME","UT","C1") values ('1','Acme',Unsupported Type,NULL)""")
      == Map("ID" -> Some("1"), "NAME" -> Some("Acme"), "UT" -> None,
        "C1" -> None))
  }

  test("table aliases strip from SET and WHERE columns") {
    val sql =
      """update "MYAPP"."TEST" a set a."COL1" = '1', a."COL2" = NULL, a."COL3" = 'Hello'"""
    assert(newVals(sql) == Map("COL1" -> Some("1"), "COL2" -> None,
      "COL3" -> Some("Hello")))
  }

  test("IS NULL / IS NOT NULL predicates are excluded from old values") {
    val sql =
      """delete from "MYAPP"."TEST" where "C1" = '1' and "C2" IS NULL and "C3" IS NOT NULL"""
    assert(oldVals(sql) == Map("C1" -> Some("1")))
  }

  test("value conversion: dates, timestamps, hex raw, UNISTR") {
    assert(ValueConverter.convert("TO_DATE('2020-01-15','YYYY-MM-DD')") ==
      "2020-01-15")
    assert(ValueConverter.convert("TO_TIMESTAMP('2020-02-01 00:00:00.')") ==
      "2020-02-01 00:00:00")
    assert(ValueConverter.convert("HEXTORAW('48656C6C6F')") == "48656c6c6f")
    assert(ValueConverter.convert("""UNISTR('caf\00e9')""") == "café")
    assert(ValueConverter.convert(
      """UNISTR('a\00e9') || UNISTR('\0436')""") == "aéж")
    assert(ValueConverter.convert("plain") == "plain")
  }

  test("transaction cache: commit emits, rollback discards, interleaved XIDs") {
    val rows = Seq(
      RedoRow(10, "t1", 6, ""),
      RedoRow(11, "t1", 1,
        """insert into "S"."T" ("ID") values ('1')"""),
      RedoRow(12, "t2", 6, ""),
      RedoRow(13, "t2", 1,
        """insert into "S"."T" ("ID") values ('2')"""),
      RedoRow(14, "t1", 1,
        """insert into "S"."T" ("ID") values ('3')"""),
      RedoRow(15, "t2", 7, ""), // t2 commits first
      RedoRow(16, "t3", 6, ""),
      RedoRow(17, "t3", 1,
        """insert into "S"."T" ("ID") values ('99')"""),
      RedoRow(18, "t3", 36, ""), // rolled back
      RedoRow(19, "t1", 7, ""))
    val (events, checkpoint) = assemble(rows)
    val ids = events.map(_._3.newValues.head._2.get)
    assert(ids == Seq("2", "1", "3"), "commit order, then arrival order")
    assert(checkpoint == 19L, "all txns closed → checkpoint = commit scn")
  }

  test("low watermark: checkpoint cannot pass an open transaction's start") {
    val cache = new TxnCache
    cache.start("a", 100)
    cache.start("b", 200)
    assert(cache.lowWatermark() == 100)
    assert(cache.lowWatermark(excludeXid = "a") == 200)
    cache.commit("a")
    assert(cache.lowWatermark() == 200)
    // assemble: committing at scn 300 while txn 'open' started at 150
    val rows = Seq(
      RedoRow(150, "open", 6, ""),
      RedoRow(151, "open", 1,
        """insert into "S"."T" ("ID") values ('x')"""),
      RedoRow(200, "done", 6, ""),
      RedoRow(201, "done", 1,
        """insert into "S"."T" ("ID") values ('y')"""),
      RedoRow(300, "done", 7, ""))
    val (_, checkpoint) = assemble(rows)
    assert(checkpoint == 150L,
      "open txn pins the checkpoint below its start SCN")
  }

  test("config input form: oracledb_cdc replays a recorded redo_file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_redo")
    val path = s"$dir/stream.jsonl"
    writeRedoFile(path, Seq(
      RedoRow(1, "t", 6, ""),
      RedoRow(2, "t", 1,
        """insert into "S"."ITEMS" ("ID","NAME") values ('7','it''s')"""),
      RedoRow(3, "t", 7, "")))
    val config =
      s"""input:
         |  oracledb_cdc:
         |    redo_file: "$path"
         |    table: items
         |    columns: [ id, name ]
         |output:
         |  memory: { name: ora_cdc_out }
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    val out = spark.table("ora_cdc_out").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == """{"id":"7","name":"it's"}""")
    val meta = out.head.getMap[String, String](1)
    assert(meta("operation") == "c" && meta("table") == "items")
  }

  test("changes: partial updates surface only their columns; order preserved") {
    val rows = Seq(
      RedoRow(1, "t", 6, ""),
      RedoRow(2, "t", 1,
        """insert into "S"."ORDERS" ("K","V","W") values ('1','a','x')"""),
      RedoRow(3, "t", 3,
        """update "S"."ORDERS" set "V" = 'b' where "K" = '1'"""),
      RedoRow(4, "t", 7, ""))
    val df = changes(spark, rows, "orders", Seq("k", "v", "w"))
    val got = df.orderBy("__ord").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq(("1", "a", "x", "c"), ("1", "b", null, "u")))
  }
}
