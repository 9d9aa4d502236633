package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.awk.Awk

/** The AWK engine (graft.awk.Awk) and the `awk` processor
  * (operators/AwkOps.scala) against internal/impl/awk/processor.go's
  * documented behavior — including both doc examples verbatim.
  */
class AwkSpec extends SparkSpec {
  import spark.implicits._

  private def run(prog: String, input: String,
                  vars: Map[String, String] = Map.empty): String =
    Awk.run(prog, input, vars).output

  // ── language conformance ──

  test("fields, NF, NR, default FS") {
    assert(run("{ print NR, NF, $2 }", "a b c\n x  y\n") ==
      "1 3 b\n2 2 y\n")
  }

  test("custom FS and OFS; field assignment rebuilds $0") {
    assert(run("BEGIN { FS=\",\"; OFS=\"-\" } { $2 = \"X\"; print $0 }",
      "a,b,c\n") == "a-X-c\n")
    assert(run("BEGIN { FS=\",\" } { $5 = \"new\"; print NF, $0 }",
      "a,b\n") == "5 a b   new\n")
  }

  test("strnum comparison: input numbers compare numerically, strings lexically") {
    assert(run("{ if ($1 < $2) print \"lt\"; else print \"ge\" }",
      "9 10\n") == "lt\n") // numeric: 9 < 10
    assert(run("BEGIN { if (\"9\" < \"10\") print \"lt\"; else print \"ge\" }",
      "") == "ge\n") // string constants: lexical
  }

  test("uninitialized values are 0 / empty") {
    assert(run("BEGIN { print x + 3, \"[\" y \"]\" }", "") == "3 []\n")
  }

  test("arithmetic, power, modulo, precedence, concat juxtaposition") {
    assert(run("BEGIN { print 2 + 3 * 4, 2 ^ 3 ^ 2, 7 % 3, 1 \" \" 2 + 3 }",
      "") == "14 512 1 1 5\n")
  }

  test("regex patterns, match operators, dynamic regex") {
    assert(run("/b+c/ { print \"hit\", $0 }", "abc\nxyz\nbbc\n") ==
      "hit abc\nhit bbc\n")
    assert(run("{ if ($0 ~ \"^x\") print \"x:\" $0; if ($0 !~ /z$/) print \"nz\" }",
      "xab\nayz\n") == "x:xab\nnz\n")
  }

  test("ternary, logical ops, increment/decrement") {
    assert(run("BEGIN { a=5; print a>3 ? \"big\" : \"small\", a++, a, ++a, --a }",
      "") == "big 5 6 7 6\n")
  }

  test("while / do / for / break / continue") {
    assert(run("BEGIN { i=0; while (i<5) { i++; if (i==2) continue; if (i==4) break; print i } }",
      "") == "1\n3\n")
    assert(run("BEGIN { for (i=3; i>0; i--) printf \"%d;\", i }", "") ==
      "3;2;1;")
    assert(run("BEGIN { i=10; do { print i; i++ } while (i<2) }", "") ==
      "10\n")
  }

  test("associative arrays: in, delete, for-in, multi-dim SUBSEP") {
    assert(run(
      """BEGIN {
        |  a["x"]=1; a["y"]=2
        |  if ("x" in a) print "has x"
        |  delete a["x"]
        |  if (!("x" in a)) print "gone"
        |  m[1,2] = "md"
        |  if ((1,2) in m) print m[1,2]
        |  n = 0; for (k in a) n++
        |  print n
        |}""".stripMargin, "") == "has x\ngone\nmd\n1\n")
  }

  test("user functions: scalars by value, arrays by reference, locals") {
    assert(run(
      """function bump(x, arr,   i) { x = x + 1; arr["k"] = 42; i = 9; return x }
        |BEGIN { v = 5; got = bump(v, store)
        |  print v, got, store["k"], i }""".stripMargin, "") ==
      "5 6 42 \n")
  }

  test("builtins: length, substr, index, split, toupper/tolower") {
    assert(run(
      """BEGIN {
        |  print length("hello"), substr("hello", 2, 3), index("hello", "ll")
        |  n = split("a:b:c", parts, ":")
        |  print n, parts[1], parts[3], toupper("aB"), tolower("Cd")
        |}""".stripMargin, "") == "5 ell 3\n3 a c AB cd\n")
  }

  test("sub/gsub with & and RSTART/RLENGTH from match") {
    assert(run(
      """BEGIN {
        |  s = "one two two"
        |  n = sub(/two/, "[&]", s); print n, s
        |  g = "aaa"; m = gsub(/a/, "b", g); print m, g
        |  if (match("foobar", /o+/)) print RSTART, RLENGTH
        |}""".stripMargin, "") == "1 one [two] two\n3 bbb\n2 2\n")
  }

  test("printf/sprintf formats") {
    assert(run(
      """BEGIN {
        |  printf "%d|%5d|%-5d|%05.1f|%s|%c|%x\n", 42, 42, 42, 3.14, "s", 65, 255
        |  print sprintf("%.2f %g %e", 1.5, 0.25, 12.5)
        |}""".stripMargin, "") ==
      "42|   42|42   |003.1|s|A|ff\n1.50 0.25 1.250000e+01\n")
  }

  test("number formatting: integral values print without decimals; %.6g else") {
    assert(run("BEGIN { print 10/2, 1/3, 0.1+0.2, 2e20 }", "") ==
      "5 0.333333 0.3 2e+20\n")
  }

  test("next / exit / END semantics") {
    assert(run("{ if ($1 == \"skip\") next; print $1 } END { print \"end\" }",
      "a\nskip\nb\n") == "a\nb\nend\n")
    assert(run("{ if (NR == 2) exit 3; print NR } END { print \"fin\" }",
      "x\ny\nz\n") == "1\nfin\n")
    assert(Awk.run("{ exit 3 }", "x\n").exitCode == 3)
  }

  test("pattern without action prints the record") {
    assert(run("$1 > 2", "1 a\n5 b\n3 c\n") == "5 b\n3 c\n")
  }

  test("preset variables arrive as strnums") {
    assert(run("BEGIN { if (foo_bar < 11) print \"num:\" foo_bar }", "",
      Map("foo_bar" -> "9")) == "num:9\n")
  }

  test("getline and system are rejected, not silently wrong") {
    intercept[Awk.ParseError](Awk.parse("{ getline line }"))
    intercept[Awk.AwkError](Awk.run("BEGIN { system(\"ls\") }", ""))
  }

  // ── the processor over DataFrames ──

  test("doc example 1: JSON mapping and arithmetic (codec none)") {
    val program =
      """function map_add_vals() {
        |  json_set_int("doc.result", json_get("doc.val1") + json_get("doc.val2"));
        |}
        |function map_multiply_vals() {
        |  json_set_int("doc.result", json_get("doc.val1") * json_get("doc.val2"));
        |}
        |function map_unknown(type) {
        |  json_set("error","unknown document type");
        |  print_log("Document type not recognised: " type, "ERROR");
        |}
        |{
        |  type = json_get("type");
        |  if (type == "add")
        |    map_add_vals();
        |  else if (type == "multiply")
        |    map_multiply_vals();
        |  else
        |    map_unknown(type);
        |}""".stripMargin
    val in = Seq(
      """{"doc":{"val1":5,"val2":10},"id":"1","type":"add"}""",
      """{"doc":{"val1":5,"val2":10},"id":"2","type":"multiply"}""",
      """{"doc":{"val1":5,"val2":10},"id":"3","type":"nope"}""").toDF("value")
    val out = AwkOps.awk(in, program, codec = "none")
      .select("value").as[String].collect().toSeq
    assert(out(0) == """{"doc":{"val1":5,"val2":10,"result":15},"id":"1","type":"add"}""")
    assert(out(1) == """{"doc":{"val1":5,"val2":10,"result":50},"id":"2","type":"multiply"}""")
    assert(out(2).contains(""""error":"unknown document type""""))
  }

  test("doc example 2: array dedup via json_length/json_get/json_append") {
    val program =
      """{
        |  array_path = "path.to.foos"
        |  array_len = json_length(array_path)
        |
        |  for (i = 0; i < array_len; i++) {
        |    ele = json_get(array_path "." i)
        |    if ( ! ( ele in seen ) ) {
        |      json_append(array_path "_unique", ele)
        |      seen[ele] = 1
        |    }
        |  }
        |}""".stripMargin
    val in = Seq("""{"path":{"to":{"foos":["one","two","three","two","four"]}}}""")
      .toDF("value")
    val out = AwkOps.awk(in, program, codec = "none")
      .select("value").as[String].collect().head
    assert(out ==
      """{"path":{"to":{"foos":["one","two","three","two","four"],"foos_unique":["one","two","three","four"]}}}""")
  }

  test("codec json: flattened variables pre-populate the program") {
    val in = Seq("""{"foo":{"bar":{"value":10},"created_at":"2018-12-18T11:57:32"}}""")
      .toDF("value")
    val out = AwkOps.awk(in,
      """{ print foo_bar_value, foo_created_at }""", codec = "json")
      .select("value").as[String].collect().head
    assert(out == "10 2018-12-18T11:57:32")
  }

  test("codec text: message is the program input; print replaces contents") {
    val in = Seq("5 7\n3 4").toDF("value")
    val out = AwkOps.awk(in, "{ print $1 + $2 }", codec = "text")
      .select("value").as[String].collect().head
    assert(out == "12\n7") // one output line per input line, trailing \n trimmed
  }

  test("no print output leaves contents unchanged; metadata round-trips") {
    val in = Seq(("""{"a":1}""", Map("k" -> "v")))
      .toDF("value", "metadata")
    val out = AwkOps.awk(in,
      """{ metadata_set("seen", metadata_get("k") "!") }""", codec = "none")
    val row = out.select("value", "metadata").collect().head
    assert(row.getString(0) == """{"a":1}""")
    assert(row.getMap[String, String](1)("seen") == "v!")
  }

  test("timestamp and base64 functions") {
    assert(Awk.run(
      """BEGIN {
        |  print timestamp_unix("2018-12-18T11:57:32", "")
        |  print timestamp_format(1545134252, "2006-01-02")
        |  print base64_encode("hi"), base64_decode("aGk=")
        |}""".stripMargin, "",
      hostFuncs = AwkOps.stockFuncs).output ==
      "1545134252\n2018-12-18\naGk= hi\n")
  }

  test("runtime errors mark the error channel, not the task") {
    val in = Seq("not json").toDF("value")
    val out = AwkOps.awk(in, """{ json_set("a", "b") }""", codec = "none")
    val row = out.select("value", "error").collect().head
    assert(row.getString(0) == "not json")
    assert(row.getString(1) != null && row.getString(1).startsWith("awk:"))
  }
}
