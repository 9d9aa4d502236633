package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Http, JavaScript}

/** The `javascript` processor contracts, mirroring the reference's
  * own test corpus (internal/impl/javascript/processor_test.go —
  * behaviors re-asserted, no code ported).
  */
class JavaScriptProcSpec extends SparkSpec {

  import spark.implicits._

  private def envelope(values: String*) =
    values.toSeq.toDF("value")
      .withColumn("metadata", map().cast("map<string,string>"))
      .withColumn("error", lit(null).cast("string"))

  private def run(df: org.apache.spark.sql.DataFrame, code: String,
                  modules: Map[String, String] = Map.empty,
                  client: Http.Client = null): Seq[Row] =
    JavaScript.processor(df, code, modules, client)
      .select("value", "metadata", "error").collect().toSeq

  test("basic: IIFE string mutation per message (TestProcessorBasic)") {
    val out = run(envelope("first ", "second "),
      """(() => {
        |  let foo = "hello world"
        |  benthos.v0_msg_set_string(benthos.v0_msg_as_string() + foo);
        |})();
        |""".stripMargin)
    assert(out.map(_.getString(0)) == Seq("first hello world", "second hello world"))
    assert(out.forall(_.isNullAt(2)))
  }

  test("no encapsulation: bare statement works (TestProcessorNoEncapsulation)") {
    val out = run(envelope("first ", "second "),
      """benthos.v0_msg_set_string(benthos.v0_msg_as_string() + "hello world");""")
    assert(out.map(_.getString(0)) == Seq("first hello world", "second hello world"))
  }

  test("metadata: set/get, structured values stringified (TestProcessorMetadata)") {
    val out = run(envelope("first"),
      """(() => {
        |  benthos.v0_msg_set_meta("testa", "hello world");
        |  benthos.v0_msg_set_meta("testb", benthos.v0_msg_get_meta("testa") + " two");
        |  benthos.v0_msg_set_meta("testc", ["first","second"]);
        |  benthos.v0_msg_set_meta("testd", 123.4);
        |})();
        |""".stripMargin)
    assert(out.head.getString(0) == "first")
    val meta = out.head.getMap[String, String](1)
    assert(meta("testa") == "hello world")
    assert(meta("testb") == "hello world two")
    // envelope metadata is map<string,string>: structured values are
    // JSON-encoded (the reference keeps them dynamic in-memory)
    assert(meta("testc") == """["first","second"]""")
    assert(meta("testd") == "123.4")
  }

  test("structured: num_keys + delete round-trips (TestProcessorStructured)") {
    val out = run(envelope("""{"a":"a value","b":"b value"}"""),
      """(() => {
        |  let thing = benthos.v0_msg_as_structured();
        |  thing.num_keys = Object.keys(thing).length;
        |  delete thing["b"];
        |  benthos.v0_msg_set_structured(thing);
        |})();
        |""".stripMargin)
    assert(out.head.getString(0) == """{"a":"a value","num_keys":2}""")
  }

  test("structured imut: reading does not mutate the message (TestProcessorStructuredImut)") {
    val out = run(envelope("""{"a":"a value","b":"b value"}"""),
      """(() => {
        |  let thing = benthos.v0_msg_as_structured();
        |  thing.num_keys = Object.keys(thing).length;
        |  delete thing["b"];
        |  benthos.v0_msg_set_meta("result", thing);
        |})();
        |""".stripMargin)
    assert(out.head.getString(0) == """{"a":"a value","b":"b value"}""")
    assert(out.head.getMap[String, String](1)("result") ==
      """{"a":"a value","num_keys":2}""")
  }

  test("error handling: as_structured on non-JSON throws a catchable string (TestProcessorErrorHandling)") {
    val out = run(envelope("not a structured message"),
      """(() => {
        |  try {
        |    let thing = benthos.v0_msg_as_structured();
        |    benthos.v0_msg_set_meta("no_err", thing);
        |  } catch (e) {
        |    benthos.v0_msg_set_meta("err", e);
        |  }
        |})();
        |""".stripMargin)
    assert(out.head.getString(0) == "not a structured message")
    val meta = out.head.getMap[String, String](1)
    assert(!meta.contains("no_err"))
    assert(meta("err").nonEmpty) // jackson's message, not Go's — shape only
    assert(out.head.isNullAt(2)) // caught in JS → message stays healthy
  }

  test("get_meta of a missing key throws 'key not found'") {
    val out = run(envelope("x"),
      """try { benthos.v0_msg_get_meta("nope"); }
        |catch (e) { benthos.v0_msg_set_meta("caught", e); }
        |""".stripMargin)
    assert(out.head.getMap[String, String](1)("caught") == "key not found")
  }

  test("uncaught JS exception marks the error channel, not the task") {
    val out = run(envelope("""{"ok":1}""", "not json"),
      "benthos.v0_msg_set_structured(benthos.v0_msg_as_structured());")
    assert(out(0).getString(0) == """{"ok":1}""")
    assert(out(0).isNullAt(2))
    assert(out(1).getString(0) == "not json") // unchanged
    assert(!out(1).isNullAt(2))               // errored
  }

  test("require() from global_folders modules (TestProcessorBasicFromModule)") {
    val out = run(envelope("hello "),
      """(() => {
        |  const blobber = require('blobber');
        |  benthos.v0_msg_set_string(benthos.v0_msg_as_string() + blobber());
        |})();
        |""".stripMargin,
      modules = Map("blobber" ->
        "function blobber() {\n  return 'blobber module';\n}\nmodule.exports = blobber;"))
    assert(out.head.getString(0) == "hello blobber module")
  }

  test("v0_fetch: synchronous HTTP via the transport seam (TestProcessorHTTPFetch)") {
    val echo: Http.Client = reqs => reqs.map { q =>
      Http.Response(200, "echo: " + q.body.toUpperCase)
    }
    val out = run(envelope("first", "second"),
      """(() => {
        |  let foo = benthos.v0_fetch("http://x.test/echo", {}, "GET", benthos.v0_msg_as_string());
        |  benthos.v0_msg_set_string(foo.status.toString() + ": " + foo.body);
        |})();
        |""".stripMargin,
      client = echo)
    assert(out.map(_.getString(0)) == Seq("200: echo: FIRST", "200: echo: SECOND"))
  }

  test("VM state persists across messages within a partition (pooled runtime)") {
    val df = envelope("a", "b", "c").repartition(1)
    val out = run(df,
      """if (typeof n === 'undefined') { n = 0; }
        |n++;
        |benthos.v0_msg_set_string(benthos.v0_msg_as_string() + n);
        |""".stripMargin)
    assert(out.map(_.getString(0)).sorted == Seq("a1", "b2", "c3"))
  }

  test("syntax errors fail at plan time, not per row") {
    intercept[Exception] {
      JavaScript.processor(envelope("x"), "let = broken ((")
    }
  }

  test("config runner wires the javascript processor") {
    val yaml =
      """pipeline:
        |  processors:
        |    - javascript:
        |        code: 'benthos.v0_msg_set_string(benthos.v0_msg_as_string().toUpperCase());'
        |""".stripMargin
    val node = new com.fasterxml.jackson.dataformat.yaml.YAMLMapper().readTree(yaml)
    val procs = node.path("pipeline").path("processors")
    val compiled = graft.config.Processors.compile(
      procs.elements().next(), Map.empty)
    val out = compiled(envelope("shout")).select("value").as[String].collect()
    assert(out.toSeq == Seq("SHOUT"))
  }
}
