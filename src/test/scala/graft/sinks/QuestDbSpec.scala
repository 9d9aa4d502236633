package graft.sinks

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.QuestDb._

/** questdb output contracts: ILP encoding rules, the reference's
  * timestamp-unit auto-guess boundaries, and the wire round-trip
  * (internal/impl/questdb behaviors re-asserted, no code ported).
  */
class QuestDbSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private def enc(json: String, symbols: Set[String] = Set.empty,
                  doubles: Set[String] = Set.empty,
                  tsField: String = "", tsUnit: String = "auto") =
    encodeLine(mapper.readTree(json), "tbl", symbols, doubles,
      tsField, tsUnit)

  test("auto unit guess matches the reference's magnitude boundaries") {
    assert(guessUnit(9999999999L) == "seconds")
    assert(guessUnit(10000000000L) == "millis")
    assert(guessUnit(9999999999999L) == "millis")
    assert(guessUnit(10000000000000L) == "micros")
    assert(guessUnit(9999999999999999L) == "micros")
    assert(guessUnit(10000000000000000L) == "nanos")
    assert(toNanos(5L, "seconds") == 5000000000L)
    assert(toNanos(5L, "auto") == 5000000000L)
  }

  test("typed field encoding: i-suffix ints, bare floats, t/f bools, quoted strings") {
    assert(enc("""{"a":42,"b":1.5,"c":true,"d":"hi","e":false}""").get ==
      """tbl a=42i,b=1.5,c=t,d="hi",e=f""")
    // doubles config forces float even for integral JSON tokens
    assert(enc("""{"a":42}""", doubles = Set("a")).get == "tbl a=42.0")
  }

  test("symbols become tags before the field set; escaping per ILP rules") {
    assert(enc("""{"host":"eu west","v":1}""", symbols = Set("host")).get ==
      """tbl,host=eu\ west v=1i""")
    assert(enc("""{"k=1,x":"a\"b","v":2}""").get ==
      """tbl k\=1\,x="a\"b",v=2i""")
  }

  test("designated timestamp lands as trailing nanos and leaves the field set") {
    assert(enc("""{"v":1,"ts":1700000000}""", tsField = "ts",
      tsUnit = "seconds").get == "tbl v=1i 1700000000000000000")
    assert(enc("""{"v":1,"ts":1700000000000000}""", tsField = "ts",
      tsUnit = "auto").get == "tbl v=1i 1700000000000000000")
  }

  test("docs with no payload fields are skipped (sender errors on empty rows)") {
    assert(enc("""{"ts":1700000000}""", tsField = "ts",
      tsUnit = "seconds").isEmpty)
  }

  test("wire round-trip through the independent decoder") {
    val name = "qdt_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val svc = QuestDb.named(name)
    val docs = Seq(
      """{"sym":"a b","n":7,"x":2.25,"ok":true,"s":"q\"t","ts":1700000001}""",
      """{"sym":"c,d","n":-1,"x":0.5,"ok":false,"s":"z","ts":1700000002}""")
      .toDF("value")
    QuestDb.write(docs, s"mem://$name", "t1", symbols = Set("sym"),
      designatedTimestampField = "ts", designatedTimestampUnit = "seconds")
    val rows = svc.rows("t1").sortBy(_._2.get)
    assert(rows.size == 2)
    val (m1, ts1) = rows.head
    assert(m1("sym") == "a b" && m1("n") == 7L && m1("x") == 2.25 &&
      m1("ok") == true && m1("s") == "q\"t")
    assert(ts1.contains(1700000001000000000L))
    val (m2, _) = rows(1)
    assert(m2("sym") == "c,d" && m2("n") == -1L && m2("ok") == false)
    QuestDb.drop(name)
  }

  test("a rejected POST fails the write loudly") {
    val bad: graft.operators.Http.Client =
      reqs => reqs.map(_ => graft.operators.Http.Response(400, "nope"))
    val e = intercept[org.apache.spark.SparkException] {
      QuestDb.write(Seq("""{"v":1}""").toDF("value"), "stub://x", "t",
        client = bad)
    }
    assert(e.getMessage.contains("400") ||
      Option(e.getCause).exists(_.getMessage.contains("400")))
  }

  test("sharded write fans partitions over endpoints; union is complete") {
    val base = "qds_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val names = (0 until 3).map(i => s"${base}_$i")
    val svcs = names.map(QuestDb.named)
    val docs = (0 until 120).map(i => s"""{"id":$i}""").toDF("value")
      .repartition(8)
    QuestDb.writeSharded(docs, names.map(n => s"mem://$n"), "t")
    val perShard = svcs.map(_.rows("t").size)
    // every shard took traffic (8 partitions round-robin over 3)
    assert(perShard.forall(_ > 0), perShard.toString)
    val ids = svcs.flatMap(_.rows("t")).map(_._1("id").asInstanceOf[Long])
    assert(ids.sorted == (0L until 120L).toVector, "union must be lossless")
    names.foreach(QuestDb.drop)
  }

  test("config output form: questdb addresses list shards the ingest") {
    val base = "qdl_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val names = Seq(s"${base}_0", s"${base}_1")
    val svcs = names.map(QuestDb.named)
    val config =
      s"""input:
         |  generate: { count: 40, mapping: 'root.id = this.seq' }
         |output:
         |  questdb:
         |    addresses: [${names.map(n => s""""mem://$n"""").mkString(", ")}]
         |    table: gen
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    assert(svcs.map(_.rows("gen").size).sum == 40)
    names.foreach(QuestDb.drop)
  }

  test("config output form: questdb") {
    val name = "qdc_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val svc = QuestDb.named(name)
    val config =
      s"""input:
         |  generate: { count: 3, mapping: 'root.id = this.seq' }
         |output:
         |  questdb:
         |    address: "mem://$name"
         |    table: gen
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    assert(svc.rows("gen").size == 3)
    QuestDb.drop(name)
  }
}
