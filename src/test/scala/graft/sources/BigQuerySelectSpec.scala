package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.BigQuerySelect._

/** gcp_bigquery_select contracts: query-parts assembly, typed
  * positional parameters, pageToken pagination, auth, per-message
  * row-array replacement.
  */
class BigQuerySelectSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "bqt_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("query text assembles from the reference's parts") {
    assert(QueryParts("t", Seq("a", "b")).sql == "SELECT a, b FROM t")
    assert(QueryParts("t", Seq("*"), where = "k = ?").sql ==
      "SELECT * FROM t WHERE k = ?")
    assert(QueryParts("t", Seq("a"), where = "k = ?",
      prefix = "/* hint */", suffix = "LIMIT 5").sql ==
      "/* hint */ SELECT a FROM t WHERE k = ? LIMIT 5")
  }

  test("typed positional parameters; filtered select") {
    val name = fresh
    val svc = BigQuerySelect.register(name, "tok")
    svc.seed("t", Seq("k", "v"),
      Seq(Seq("1", "one"), Seq("2", "two"), Seq("1", "uno")))
    val c = new Client(s"mem://$name", "tok", "p")
    val (cols, rows) = c.query("SELECT v FROM t WHERE k = ?", Seq(1L))
    assert(cols == Seq("v"))
    assert(rows == Seq(Seq("one"), Seq("uno")))
    BigQuerySelect.drop(name)
  }

  test("pageToken continuations drain multi-page results") {
    val name = fresh
    val svc = BigQuerySelect.register(name, "tok", pageSize = 10)
    svc.seed("big", Seq("n"), (1 to 35).map(i => Seq(i.toString)))
    val c = new Client(s"mem://$name", "tok", "p")
    val (_, rows) = c.query("SELECT * FROM big", Nil)
    assert(rows.size == 35)
    assert(svc.pagesServed == 3, "pages 2..4 come from GET continuations")
    BigQuerySelect.drop(name)
  }

  test("processor replaces the message with the row array; errors per item") {
    val name = fresh
    val svc = BigQuerySelect.register(name, "tok")
    svc.seed("t", Seq("k", "v"), Seq(Seq("a", "1")))
    val df = Seq(("a", ""), ("zz", "")).toDF("k", "value")
    val out = BigQuerySelect.processor(df, s"mem://$name", "tok", "p",
        QueryParts("t", Seq("v"), where = "k = ?"), Seq(col("k")))
      .select("k", "value").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == """[{"v":"1"}]""")
    assert(out("zz") == "[]", "no rows → empty array, not an error")
    val bad = BigQuerySelect.processor(df.limit(1), s"mem://$name",
        "wrong-token", "p", QueryParts("t", Seq("v"), where = "k = ?"),
        Seq(col("k")))
      .select("error").as[String].collect().head
    assert(bad.contains("401"))
    assert(svc.rejected >= 1)
    BigQuerySelect.drop(name)
  }
}
