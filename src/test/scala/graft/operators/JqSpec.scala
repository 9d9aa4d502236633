package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** jq-subset semantics: paths, iterate fan-out, select, keys/length,
  * object construction, and the jmespath translation.
  */
class JqSpec extends SparkSpec {

  private def docs(jsons: String*) = {
    import spark.implicits._
    jsons.zipWithIndex.map { case (j, i) => (i.toLong, j) }.toDF("id", "value")
  }

  private def results(program: String, jsons: String*): Seq[String] = {
    import spark.implicits._
    Jq.run(docs(jsons: _*), program, "value", "out")
      .orderBy("id").select("out").as[String].collect().toSeq
  }

  test("field paths and index access") {
    assert(results(".a.b", """{"a":{"b":42}}""") == Seq("42"))
    assert(results(".xs[1]", """{"xs":[10,20,30]}""") == Seq("20"))
    assert(results(".a.b.c", """{"a":{}}""") == Seq("null"))
  }

  test("iterate fans out one row per element and drops non-arrays") {
    assert(results(".xs[]", """{"xs":[1,2,3]}""") == Seq("1", "2", "3"))
    assert(results(".xs[]", """{"xs":"not an array"}""").isEmpty)
  }

  test("pipe + select filters stream elements") {
    assert(results(".items[] | select(.price > 10) | .name",
      """{"items":[{"name":"a","price":5},{"name":"b","price":15},{"name":"c","price":20}]}""")
      == Seq("\"b\"", "\"c\""))
    assert(results(".[] | select(.tag == \"x\")",
      """[{"tag":"x","v":1},{"tag":"y","v":2}]""") == Seq("""{"tag":"x","v":1}"""))
  }

  test("keys and length") {
    assert(results("keys", """{"b":1,"a":2}""") == Seq("""["a","b"]"""))
    assert(results(".xs | length", """{"xs":[1,2,3,4]}""") == Seq("4"))
    assert(results(".s | length", """{"s":"hello"}""") == Seq("5"))
  }

  test("object construction") {
    assert(results("{id: .user.id, n: .count}",
      """{"user":{"id":7},"count":3,"noise":true}""")
      == Seq("""{"id":7,"n":3}"""))
  }

  test("jmespath basics translate onto the same engine") {
    import spark.implicits._
    val df = docs("""{"a":{"b":[{"c":1},{"c":2}]}}""")
    val out = Jq.jmespath(df, "a.b[*].c", "value")
      .select("jmes").as[String].collect().toSeq
    assert(out == Seq("1", "2"))
  }
}
