package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.MySqlBinlog._

/** MySQL binlog wire-decoder contract tests against fixture event
  * streams built by the independent [[MySqlBinlog.Fixture]] encoder:
  * the public binlog-v4 event formats (FORMAT_DESCRIPTION / ROTATE /
  * TABLE_MAP / WRITE/UPDATE/DELETE_ROWS v2 / XID), the TYPES.md
  * delivery matrix (packed DATETIME2/TIMESTAMP2/TIME2, packed
  * NEWDECIMAL, ENUM/SET indexes, binary JSON, zero-dates as null),
  * null bitmaps, update before/after images, restart cursors, and the
  * relational apply.
  */
class MySqlBinlogSpec extends SparkSpec {

  private val T0 = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-03-05T13:14:15.123456Z"))

  // one column per TYPES.md row
  private val matrixDef = TableDef("shop", "t_all", Vector(
    ColDef("c_tiny", "tinyint"), ColDef("c_utiny", "tinyint unsigned"),
    ColDef("c_small", "smallint"), ColDef("c_med", "mediumint"),
    ColDef("c_int", "int"), ColDef("c_uint", "int unsigned"),
    ColDef("c_big", "bigint"), ColDef("c_year", "year"),
    ColDef("c_float", "float"), ColDef("c_double", "double"),
    ColDef("c_dec", "decimal(12,4)"), ColDef("c_date", "date"),
    ColDef("c_dt", "datetime(6)"), ColDef("c_ts", "timestamp(6)"),
    ColDef("c_time", "time(3)"), ColDef("c_bit", "bit(12)"),
    ColDef("c_vc", "varchar(40)"), ColDef("c_ch", "char(8)"),
    ColDef("c_blob", "blob"),
    ColDef("c_enum", "enum('red','green','blue')"),
    ColDef("c_set", "set('a','b','c','d')"),
    ColDef("c_json", "json")))

  private val schemas = Map("shop.t_all" -> matrixDef)

  private def matrixRow(fx: Fixture): Seq[Any] = Seq(
    -7, 200, -3000, -100000, -2000000, 3000000000L, 9000000000L, 2024,
    1.5f, 2.25, "12345.6700", T0, T0, T0, "13:14:15.123", 0xabcL,
    "varchar-v", "char-v", Array[Byte](1, 2, 3),
    "green", Seq("a", "c"),
    fx.jsonBinary(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("""{"k":"v","n":42,"arr":[1,true,null],"d":1.5}""")))

  test("TYPES.md matrix: schema types and decoded values") {
    val fx = new Fixture()
    val events = Seq(
      fx.formatDescription(),
      fx.rotate("binlog.000001"),
      fx.tableMap(23L, matrixDef),
      fx.writeRows(23L, matrixDef, Seq(matrixRow(fx))),
      fx.xid(1L))
    val df = typedChanges(spark, events, "t_all", schemas)
    val s = df.schema
    def tpe(n: String) = s(n).dataType
    assert(tpe("c_tiny") == IntegerType && tpe("c_utiny") == IntegerType)
    assert(tpe("c_med") == IntegerType && tpe("c_int") == IntegerType)
    assert(tpe("c_uint") == LongType, "unsigned int promotes to Int64")
    assert(tpe("c_big") == LongType && tpe("c_year") == IntegerType)
    assert(tpe("c_float") == FloatType && tpe("c_double") == DoubleType)
    assert(tpe("c_dec") == StringType, "decimal stays a string")
    assert(tpe("c_date") == TimestampType && tpe("c_dt") == TimestampType)
    assert(tpe("c_time") == StringType && tpe("c_bit") == LongType)
    assert(tpe("c_blob") == BinaryType)
    assert(tpe("c_enum") == StringType)
    assert(tpe("c_set") == ArrayType(StringType))
    assert(tpe("c_json") == StringType)

    val r = df.collect().head
    assert(r.getInt(0) == -7 && r.getInt(1) == 200)
    assert(r.getInt(2) == -3000 && r.getInt(3) == -100000)
    assert(r.getInt(4) == -2000000)
    assert(r.getLong(5) == 3000000000L, "unsigned INT survives > 2^31")
    assert(r.getLong(6) == 9000000000L && r.getInt(7) == 2024)
    assert(r.getFloat(8) == 1.5f && r.getDouble(9) == 2.25)
    assert(r.getString(10) == "12345.6700",
      "decimal is the canonical fixed-scale string")
    assert(r.getTimestamp(11).toInstant ==
      java.time.Instant.parse("2024-03-05T00:00:00Z"), "DATE at midnight")
    assert(r.getTimestamp(12) == T0, "DATETIME2 micros survive")
    assert(r.getTimestamp(13) == T0, "TIMESTAMP2 micros survive")
    assert(r.getString(14) == "13:14:15.123")
    assert(r.getLong(15) == 0xabcL, "BIT as Int64")
    assert(r.getString(16) == "varchar-v" && r.getString(17) == "char-v")
    assert(r.getAs[Array[Byte]](18).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getString(19) == "green", "enum index → literal")
    assert(r.getSeq[String](20) == Seq("a", "c"), "set bitset → literals")
    assert(r.getString(21) ==
      """{"k":"v","n":42,"arr":[1,true,null],"d":1.5}""",
      "binary JSON round-trips to text")
  }

  test("nulls ride the null bitmap; zero dates deliver SQL NULL") {
    val fx = new Fixture()
    val nulls: Seq[Any] = Seq(null, null, null, null, null, null, null,
      null, null, null, null, "zero", "zero", "zero", null, null, null,
      null, null, null, null, null)
    val events = Seq(
      fx.formatDescription(), fx.rotate("binlog.000001"),
      fx.tableMap(23L, matrixDef),
      fx.writeRows(23L, matrixDef, Seq(nulls)),
      fx.xid(1L))
    val r = typedChanges(spark, events, "t_all", schemas).collect().head
    (0 until 22).foreach(i =>
      assert(r.isNullAt(i), s"col $i should be null (zero-date rule)"))
  }

  test("negative decimal, zero decimal, and scale-only decimal " +
       "canonicalise with fixed scale") {
    val dec = TableDef("shop", "d", Vector(
      ColDef("id", "int"), ColDef("a", "decimal(12,4)"),
      ColDef("b", "decimal(20,0)"), ColDef("c", "decimal(6,6)")))
    val sch = Map("shop.d" -> dec)
    val fx = new Fixture()
    val events = Seq(
      fx.formatDescription(), fx.rotate("b.1"), fx.tableMap(5L, dec),
      fx.writeRows(5L, dec, Seq(
        Seq(1, "-98765.4321", "12345678901234567890", "0.000001"),
        Seq(2, "0.0000", "0", "0.999999"))),
      fx.xid(1L))
    val rows = typedChanges(spark, events, "d", sch)
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "-98765.4321")
    assert(rows(0).getString(2) == "12345678901234567890",
      "20-digit decimal survives (beyond int64)")
    assert(rows(0).getString(3) == "0.000001")
    assert(rows(1).getString(1) == "0.0000")
    assert(rows(1).getString(2) == "0" && rows(1).getString(3) ==
      "0.999999")
  }

  test("update events deliver before+after images; delete delivers " +
       "the old image; XID bounds transactions") {
    val td = TableDef("shop", "t", Vector(
      ColDef("id", "int"), ColDef("v", "varchar(10)")))
    val sch = Map("shop.t" -> td)
    val fx = new Fixture()
    val events = Seq(
      fx.formatDescription(), fx.rotate("b.1"), fx.tableMap(9L, td),
      fx.writeRows(9L, td, Seq(Seq(1, "a"), Seq(2, "b"))),
      fx.xid(1L),
      fx.tableMap(9L, td),
      fx.updateRows(9L, td, Seq((Seq(2, "b"), Seq(2, "b2")))),
      fx.deleteRows(9L, td, Seq(Seq(1, "a"))),
      fx.xid(2L))
    val cs = decodeChanges(events, sch)
    assert(cs.map(_.op) == Vector("c", "c", "u", "d"))
    val u = cs(2)
    assert(u.before.get == Vector(2, "b") && u.data == Vector(2, "b2"))
    assert(cs(3).data == Vector(1, "a") && cs(3).before.get ==
      Vector(1, "a"))
    assert(cs.map(_.seq) == Vector(0L, 1L, 2L, 3L))
    // relational apply
    val state = Cdc.latestState(
      typedChanges(spark, events, "t", sch), Seq("id"), col("__seq"))
      .select("id", "v").orderBy("id").collect()
    assert(state.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((2, "b2")))
  }

  test("rotate carries the binlog file for the position cursor; " +
       "fromSeq resumes past applied changes") {
    val td = TableDef("shop", "t", Vector(ColDef("id", "int")))
    val sch = Map("shop.t" -> td)
    val fx = new Fixture()
    val events = Seq(
      fx.formatDescription(), fx.rotate("binlog.000007"),
      fx.tableMap(9L, td)) ++
      (0 until 50).map(i => fx.writeRows(9L, td, Seq(Seq(i)))) ++
      Seq(fx.rotate("binlog.000008"), fx.tableMap(9L, td)) ++
      (50 until 80).map(i => fx.writeRows(9L, td, Seq(Seq(i)))) :+
      fx.xid(1L)
    val all = decodeChanges(events, sch)
    assert(all.take(50).forall(_.file == "binlog.000007"))
    assert(all.drop(50).forall(_.file == "binlog.000008"))
    assert(all.map(c => c.data.head) == (0 until 80).toVector)
    val resumed = changeIterator(events.iterator, sch,
      fromSeq = all(59).seq).toVector
    assert(resumed.map(_.data.head) == (60 until 80).toVector,
      "resume delivers exactly the changes past the cursor, across " +
      "the file rotation")
  }

  test("replay larger than the admission chunk spills bounded and " +
       "matches the eager decode; poller sweeps drain without dups") {
    val td = TableDef("shop", "t", Vector(
      ColDef("id", "int"), ColDef("v", "varchar(16)")))
    val sch = Map("shop.t" -> td)
    val fx = new Fixture()
    val n = 900
    val events = Seq(
      fx.formatDescription(), fx.rotate("b.1"), fx.tableMap(9L, td)) ++
      (0 until n).map(i =>
        fx.writeRows(9L, td, Seq(Seq(i, s"v$i")))) :+ fx.xid(1L)
    val df = typedChanges(spark, events, "t", sch, admitChunk = 100)
    assert(MySqlBinlog.lastAdmissionChunks >= n / 100,
      "the stream must spill in bounded chunks")
    val rows = df.orderBy("__seq").collect()
    assert(rows.length == n)
    assert(rows.map(_.getInt(0)).toSeq == (0 until n))
    // poller
    val p = MySqlBinlog.poller(events, sch, chunk = 250)
    var cursor: Option[String] = None
    val seen = Vector.newBuilder[String]
    var done = false
    while (!done) {
      val (r, next) = p(cursor)
      if (r.isEmpty) done = true else { seen ++= r.map(_._1); cursor = next }
    }
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(seen.result().map(v =>
      m.readTree(v).get("data").get("id").asInt) == (0 until n),
      "poller drains exhaustively in order with no duplicates")
  }

  test("envelope form emits the StreamMessage JSON with binlog " +
       "position metadata; binlog FILE round-trips through disk") {
    val td = TableDef("shop", "t", Vector(
      ColDef("id", "int"), ColDef("v", "varchar(16)")))
    val sch = Map("shop.t" -> td)
    val fx = new Fixture()
    val events = Seq(
      fx.formatDescription(), fx.rotate("b.1"), fx.tableMap(9L, td),
      fx.writeRows(9L, td, Seq(Seq(1, "x"))), fx.xid(1L))
    val f = java.nio.file.Files.createTempFile("binlog_", ".bin").toString
    fx.writeBinlogFile(f, events)
    val back = readBinlogFile(f)
    assert(back.size == events.size)
    assert(back.zip(events).forall { case (a, b) => a.sameElements(b) },
      "binlog file round-trips byte-exactly")
    val rows = changes(spark, back, sch).collect()
    assert(rows.length == 1)
    val v = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(rows.head.getString(0))
    assert(v.get("operation").asText == "insert")
    assert(v.get("table").asText == "t")
    assert(v.get("binlog").asText == "b.1")
    assert(v.get("data").get("id").asInt == 1)
    assert(rows.head.getMap[String, String](1)("position")
      .startsWith("b.1:"))
  }

  test("config runner: mysql_cdc replays a recorded binlog_file with " +
       "registered table schemas") {
    val td = TableDef("shop", "orders", Vector(
      ColDef("id", "int"), ColDef("status", "varchar(8)")))
    val fx = new Fixture()
    val events = Seq(
      fx.formatDescription(), fx.rotate("binlog.000001"),
      fx.tableMap(7L, td),
      fx.writeRows(7L, td, Seq(Seq(1, "new"), Seq(2, "new"))),
      fx.updateRows(7L, td, Seq((Seq(1, "new"), Seq(1, "paid")))),
      fx.xid(1L))
    val f = java.nio.file.Files.createTempFile("cfg_binlog_", ".bin")
      .toString
    fx.writeBinlogFile(f, events)
    val df = graft.config.Pipeline.build(spark,
      s"""input:
         |  mysql_cdc:
         |    binlog_file: $f
         |    tables:
         |      - db: shop
         |        name: orders
         |        columns:
         |          - {name: id, type: int}
         |          - {name: status, type: varchar(8)}
         |""".stripMargin)
    val rows = df.orderBy("__seq").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getMap[String, String](1)("operation")).toSeq ==
      Seq("insert", "insert", "update"))
    assert(rows.last.getString(0).contains(""""status":"paid""""))
  }

  test("malformed streams fail loudly: bad magic, unregistered table, " +
       "column count mismatch") {
    val td = TableDef("shop", "t", Vector(ColDef("id", "int")))
    val fx = new Fixture()
    intercept[IllegalArgumentException] {
      readBinlogFile {
        val f = java.nio.file.Files.createTempFile("bad_", ".bin")
        java.nio.file.Files.write(f, "nope".getBytes)
        f.toString
      }
    }
    intercept[IllegalStateException] {
      decodeChanges(Seq(fx.formatDescription(), fx.tableMap(9L, td),
        fx.writeRows(9L, td, Seq(Seq(1)))), Map.empty)
    }
    intercept[IllegalArgumentException] {
      decodeChanges(Seq(fx.tableMap(9L, td)),
        Map("shop.t" -> TableDef("shop", "t", Vector(
          ColDef("id", "int"), ColDef("extra", "int")))))
    }
  }
}
