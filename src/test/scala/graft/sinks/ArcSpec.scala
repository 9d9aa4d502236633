package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** arc msgpack-ingestion contracts: columnar transpose + equal-length
  * validation, row format, bearer/database headers, gzip encoding.
  */
class ArcSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "arct_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("columnar: grouped by measurement, transposed, un-transposed intact") {
    val name = fresh
    val svc = Arc.named(name)
    val df = Seq(
      ("cpu", """{"host":"a","v":1}"""),
      ("mem", """{"host":"a","v":5}"""),
      ("cpu", """{"host":"b","v":2}""")).toDF("m", "value").coalesce(1)
    Arc.write(df, s"mem://$name", "db1", col("m"), token = "tk")
    assert(svc.lastToken == "tk")
    assert(svc.lastDatabase == "db1")
    assert(svc.rows("db1", "cpu") ==
      Seq("""{"host":"a","v":1}""", """{"host":"b","v":2}"""))
    assert(svc.rows("db1", "mem") == Seq("""{"host":"a","v":5}"""))
    Arc.drop(name)
  }

  test("columnar rejects mismatched field sets within one batch") {
    val name = fresh
    Arc.named(name)
    val df = Seq(
      ("cpu", """{"host":"a","v":1}"""),
      ("cpu", """{"other":9}""")).toDF("m", "value").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      Arc.write(df, s"mem://$name", "db", col("m"))
    }
    assert(e.getMessage.contains("mismatched fields") ||
      Option(e.getCause).exists(_.getMessage.contains("mismatched fields")))
    Arc.drop(name)
  }

  test("row format allows varying schemas per message") {
    val name = fresh
    val svc = Arc.named(name)
    val df = Seq(
      ("t", """{"a":1}"""),
      ("t", """{"b":"x","c":false}""")).toDF("m", "value").coalesce(1)
    Arc.write(df, s"mem://$name", "db", col("m"), format = "row")
    assert(svc.rows("db", "t") ==
      Seq("""{"a":1}""", """{"b":"x","c":false}"""))
    Arc.drop(name)
  }

  test("gzip content-encoding round-trips") {
    val name = fresh
    val svc = Arc.named(name)
    val df = Seq(("g", """{"n":42}""")).toDF("m", "value").coalesce(1)
    Arc.write(df, s"mem://$name", "db", col("m"), gzip = true)
    assert(svc.rows("db", "g") == Seq("""{"n":42}"""))
    Arc.drop(name)
  }

  test("token with line breaks is rejected before any request") {
    intercept[IllegalArgumentException] {
      Arc.write(Seq(("m", "{}")).toDF("m", "value"), "mem://x", "db",
        col("m"), token = "bad\ntoken")
    }
  }
}
