package graft.operators

import scala.util.parsing.combinator.RegexParsers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** jq-subset processor (reference `jq`, docs/modules/components/pages/
  * processors/jq.adoc:26) compiled to Catalyst variant operations — no
  * per-row interpreter, the whole query is one distributed projection.
  *
  * Supported grammar (the shapes the reference's examples exercise):
  *   `.`            identity
  *   `.a.b`         field paths            `.a[0]`   index access
  *   `.a[]`         iterate (fan-out)      `e1 | e2` pipe
  *   `select(c)`    filter, c = <path> <op> <literal> (== != < <= > >=)
  *   `keys`         sorted object keys     `length`  array/object/string
  *   `{k: e, …}`    object construction (scalar member exprs)
  *
  * Execution model: a jq program maps ONE input to 0..n outputs. Each
  * stage compiles to `array<variant> → array<variant>`; the final array
  * explodes into rows (jq's streaming semantics, relationally).
  *
  * jmespath note (SURVEY §2 #5): basic jmespath (`a.b[0]`, `a[*].b`,
  * pipes) is the same path algebra — [[jmespath]] translates it onto
  * this engine.
  */
object Jq {

  sealed private trait Step
  private case class Field(name: String) extends Step
  private case class Index(i: Int) extends Step
  private case object Iterate extends Step
  private case object Identity extends Step
  private case object Keys extends Step
  private case object Length extends Step
  private case class Select(path: Seq[Step], op: String, lit: String,
                            litIsString: Boolean) extends Step
  private case class ObjCons(fields: Seq[(String, Seq[Step])]) extends Step

  private object P extends RegexParsers {
    private def ident: Parser[String] = "[A-Za-z_][A-Za-z0-9_]*".r

    private def pathStep: Parser[Seq[Step]] =
      "." ~> ident ~ rep("[" ~> "-?\\d+".r <~ "]") ~ opt("[]") ^^ {
        case n ~ idxs ~ it =>
          (Field(n) +: idxs.map(i => Index(i.toInt))) ++
            (if (it.isDefined) Seq(Iterate) else Seq.empty)
      } |
      "." ~ "[" ~> "-?\\d+".r <~ "]" ^^ (i => Seq(Index(i.toInt))) |
      ".[]" ^^ (_ => Seq(Iterate)) |
      "." ^^ (_ => Seq(Identity))

    private def path: Parser[Seq[Step]] = rep1(pathStep) ^^ (_.flatten)

    private def literal: Parser[(String, Boolean)] =
      "\"" ~> "[^\"]*".r <~ "\"" ^^ (s => (s, true)) |
      "-?\\d+(\\.\\d+)?".r ^^ (n => (n, false)) |
      ("true" | "false" | "null") ^^ (b => (b, false))

    private def selectExpr: Parser[Step] =
      "select(" ~> path ~ ("==" | "!=" | "<=" | ">=" | "<" | ">") ~ literal <~ ")" ^^ {
        case p ~ op ~ ((l, isStr)) => Select(p, op, l, isStr)
      }

    private def objCons: Parser[Step] =
      "{" ~> rep1sep(ident ~ (":" ~> path), ",") <~ "}" ^^ { fs =>
        ObjCons(fs.map { case k ~ p => (k, p) })
      }

    private def stage: Parser[Seq[Step]] =
      selectExpr ^^ (Seq(_)) | objCons ^^ (Seq(_)) |
      "keys" ^^ (_ => Seq(Keys)) | "length" ^^ (_ => Seq(Length)) |
      path

    private def program: Parser[Seq[Step]] =
      rep1sep(stage, "|") ^^ (_.flatten)

    def parse(src: String): Seq[Step] = parseAll(program, src) match {
      case Success(r, _) => r
      case err => throw new IllegalArgumentException(s"jq parse: $err")
    }
  }

  /** Scalar value of a path applied to one variant element. */
  private def pathOf(v: Column, steps: Seq[Step]): Column =
    steps.foldLeft(v) {
      case (acc, Field(n)) => variant_get(acc, s"$$.$n", "variant")
      case (acc, Index(i)) => variant_get(acc, s"$$[$i]", "variant")
      case (acc, Identity) => acc
      case (_, other) =>
        throw new IllegalArgumentException(s"$other not allowed in select path")
    }

  private def compare(v: Column, s: Select): Column = {
    val p = pathOf(v, s.path)
    val (l, r) =
      if (s.litIsString) (p.cast("string"), lit(s.lit))
      else if (s.lit == "true" || s.lit == "false")
        (p.cast("boolean"), lit(s.lit.toBoolean))
      else if (s.lit == "null") (p, lit(null))
      else (p.cast("double"), lit(s.lit.toDouble))
    s.op match {
      case "==" => if (s.lit == "null") l.isNull else l === r
      case "!=" => if (s.lit == "null") l.isNotNull else l =!= r
      case "<" => l < r
      case "<=" => l <= r
      case ">" => l > r
      case ">=" => l >= r
    }
  }

  /** One step: array<variant> → array<variant>. */
  private def applyStep(arr: Column, step: Step): Column = step match {
    case Identity => arr
    case Field(n) =>
      transform(arr, v => variant_get(v, s"$$.$n", "variant"))
    case Index(i) =>
      transform(arr, v => variant_get(v, s"$$[$i]", "variant"))
    case Iterate =>
      // null / non-array elements yield nothing (jq errors; we drop)
      flatten(transform(arr, v =>
        coalesce(try_variant_get(v, "$", "array<variant>"),
          array().cast("array<variant>"))))
    case s: Select => filter(arr, v => coalesce(compare(v, s), lit(false)))
    case Keys =>
      transform(arr, v =>
        try_parse_json(to_json(array_sort(map_keys(
          try_variant_get(v, "$", "map<string,variant>"))))))
    case Length =>
      transform(arr, v =>
        try_parse_json(
          coalesce(
            size(try_variant_get(v, "$", "array<variant>")).cast("string"),
            size(map_keys(try_variant_get(v, "$", "map<string,variant>"))).cast("string"),
            length(try_variant_get(v, "$", "string")).cast("string"))))
    case ObjCons(fields) =>
      transform(arr, v =>
        try_parse_json(to_json(struct(fields.map { case (k, p) =>
          pathOf(v, p).as(k) }: _*))))
  }

  /** Compile a jq program over a JSON string column → array<variant>
    * of results (explode for row-per-result).
    */
  def compileToResults(jsonCol: Column, program: String): Column =
    P.parse(program).foldLeft(array(try_parse_json(jsonCol)))(applyStep)

  /** Run jq over `inCol` (JSON text); one output row per jq result,
    * result JSON in `outCol`. Rows whose program yields no results drop
    * (jq streaming semantics).
    */
  def run(df: DataFrame, program: String, inCol: String,
          outCol: String = "jq"): DataFrame =
    df.withColumn("__jqr", explode(compileToResults(col(inCol), program)))
      // missing paths serialize as JSON null, matching jq's output
      .withColumn(outCol, coalesce(to_json(col("__jqr")), lit("null")))
      .drop("__jqr")

  /** Basic jmespath (docs/…/processors/jmespath.adoc:26) → the same
    * engine: `a.b[0]` ≡ `.a.b[0]`, `a[*].b` ≡ `.a[].b`, pipes pass
    * through.
    */
  def jmespath(df: DataFrame, expr: String, inCol: String,
               outCol: String = "jmes"): DataFrame = {
    val jq = expr.split("\\|").map { part =>
      val t = part.trim.replace("[*]", "[]")
      if (t.startsWith(".")) t else "." + t
    }.mkString(" | ")
    run(df, jq, inCol, outCol)
  }
}
