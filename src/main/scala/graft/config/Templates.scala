package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

/** Config templates — the reference's mechanism for packaging reusable
  * components as YAML (docs/modules/configuration/pages/templating.adoc,
  * internal/template/template.go): a template declares a component
  * `name`/`type`, typed `fields` with optional defaults, and a Bloblang
  * `mapping` that turns an object holding those fields into a concrete
  * component config. A config using the templated name expands at plan
  * build, then compiles like any hand-written component.
  *
  * The mapping runs through the SAME compiled Bloblang engine the
  * `mapping` processor uses (a one-row driver-local frame — config-build
  * cost, not data-path cost), so the full function/method surface is
  * available, exactly as upstream evaluates templates with its own
  * interpreter.
  */
object Templates {

  private val yaml = new ObjectMapper(new YAMLFactory())
  private val json = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  /** One declared field (templating.adoc `fields[]`). */
  final case class FieldSpec(name: String, tpe: String, kind: String,
                             default: Option[JsonNode],
                             options: Seq[String])

  /** `metricsMapping` is parsed and carried but INERT here: the
    * reference uses it to rename/drop per-component metric paths at
    * export, and this engine's metrics surface is the fixed small set
    * Pipeline.exportMetrics emits (no per-component path namespace to
    * rewrite). Accepting the field keeps upstream template files
    * loading verbatim; the divergence is observable only in exported
    * metric NAMES, never in data. */
  final case class Template(name: String, tpe: String,
                            fields: Seq[FieldSpec], mapping: String,
                            metricsMapping: Option[String],
                            tests: Seq[JsonNode])

  private val ComponentTypes =
    Set("cache", "input", "output", "processor", "rate_limit")

  private val registry =
    scala.collection.concurrent.TrieMap.empty[(String, String), Template]

  def parse(yamlText: String): Template = {
    val root = yaml.readTree(yamlText)
    val name = Option(root.get("name")).map(_.asText).getOrElse(
      throw new IllegalArgumentException("template needs a name"))
    val tpe = Option(root.get("type")).map(_.asText).getOrElse(
      throw new IllegalArgumentException(s"template '$name' needs a type"))
    require(ComponentTypes(tpe),
      s"template '$name': type '$tpe' is not one of $ComponentTypes")
    val fields = Option(root.get("fields"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { f =>
        FieldSpec(
          f.get("name").asText,
          f.path("type").asText("unknown"),
          f.path("kind").asText("scalar"),
          Option(f.get("default")),
          Option(f.get("options")).map(_.elements().asScala.toSeq
            .map(_.asText)).getOrElse(Seq.empty))
      }
    val mapping = Option(root.get("mapping")).map(_.asText).getOrElse(
      throw new IllegalArgumentException(s"template '$name' needs a mapping"))
    Template(name, tpe, fields, mapping,
      Option(root.get("metrics_mapping")).map(_.asText).filter(_.nonEmpty),
      Option(root.get("tests")).map(_.elements().asScala.toSeq)
        .getOrElse(Seq.empty))
  }

  /** Parse + register; the analog of the reference's `-t` glob flag. */
  def register(yamlText: String): Template = {
    val t = parse(yamlText)
    registry.update((t.tpe, t.name), t)
    t
  }

  def registerFile(path: String): Template =
    register(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Register every `*.yaml` under a directory (non-recursive). */
  def registerDir(dir: String): Seq[Template] = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.list(d).iterator().asScala
      .filter(_.toString.endsWith(".yaml")).toSeq.sortBy(_.toString)
      .map(p => registerFile(p.toString))
  }

  def lookup(tpe: String, name: String): Option[Template] =
    registry.get((tpe, name))

  def clear(): Unit = registry.clear()

  /** Resolve the user's config against the declared fields: defaults
    * fill absences, a missing field with no default is an error, and an
    * undeclared key is an error (the reference lints unrecognized
    * fields). Scalars coerce to the declared type — YAML `password:
    * 12345` must reach a string field as "12345" (the redpanda.yaml
    * template's own test pins this).
    */
  private[config] def fieldsObject(t: Template, cfg: JsonNode): ObjectNode = {
    val given =
      if (cfg == null || cfg.isNull || cfg.isMissingNode) F.objectNode()
      else cfg
    require(given.isObject,
      s"template '${t.name}': config must be an object, got $given")
    val declared = t.fields.map(_.name).toSet
    given.properties().asScala.foreach { e =>
      require(declared(e.getKey),
        s"template '${t.name}': unrecognized field '${e.getKey}'")
    }
    val out = F.objectNode()
    t.fields.foreach { f =>
      val v = Option(given.get(f.name)).orElse(f.default).getOrElse(
        throw new IllegalArgumentException(
          s"template '${t.name}': field '${f.name}' is required"))
      out.set[JsonNode](f.name, coerce(t, f, v))
    }
    out
  }

  private def coerce(t: Template, f: FieldSpec, v: JsonNode): JsonNode = {
    def scalar(n: JsonNode): JsonNode = f.tpe match {
      case "string" | "bloblang" =>
        if (n.isTextual) n
        else if (n.isValueNode) F.textNode(n.asText)
        else bad(n)
      case "string_enum" | "string_annotated_enum" =>
        val s = if (n.isTextual) n.asText else n.asText
        require(f.options.isEmpty || f.options.contains(s),
          s"template '${t.name}': field '${f.name}' must be one of " +
            s"${f.options.mkString(", ")}, got '$s'")
        F.textNode(s)
      case "int" =>
        if (n.isIntegralNumber) n
        else if (n.isTextual && n.asText.matches("-?\\d+"))
          F.numberNode(n.asText.toLong)
        else bad(n)
      case "float" =>
        if (n.isNumber) n
        else if (n.isTextual) F.numberNode(n.asText.toDouble)
        else bad(n)
      case "bool" =>
        if (n.isBoolean) n
        else if (n.isTextual && Set("true", "false")(n.asText))
          F.booleanNode(n.asText.toBoolean)
        else bad(n)
      case "unknown" | "" => n
      case other => throw new IllegalArgumentException(
        s"template '${t.name}': field type '$other' not supported")
    }
    def bad(n: JsonNode): Nothing = throw new IllegalArgumentException(
      s"template '${t.name}': field '${f.name}' expects ${f.tpe}, got $n")
    f.kind match {
      case "scalar" | "" => scalar(v)
      case "list" =>
        require(v.isArray, s"template '${t.name}': field '${f.name}' " +
          s"expects a list, got $v")
        val arr = F.arrayNode()
        v.elements().asScala.foreach(e => arr.add(scalar(e)))
        arr
      case "map" =>
        require(v.isObject, s"template '${t.name}': field '${f.name}' " +
          s"expects a map, got $v")
        val obj = F.objectNode()
        v.properties().asScala.foreach(e =>
          obj.set[JsonNode](e.getKey, scalar(e.getValue)))
        obj
      case other => throw new IllegalArgumentException(
        s"template '${t.name}': field kind '$other' not supported")
    }
  }

  // runaway guard: a template whose expansion names itself (directly or
  // through another template) would recurse through the component
  // compilers forever. The compile hooks wrap each templated dispatch in
  // `guard`, so a cycle is caught by NAME regardless of how many stack
  // frames the compilers interleave between expansions.
  private val inProgress = new ThreadLocal[List[(String, String)]] {
    override def initialValue(): List[(String, String)] = Nil
  }

  /** Run `body` with (tpe,name) marked as expanding; errors on a cycle. */
  def guard[T](tpe: String, name: String)(body: => T): T = {
    val stack = inProgress.get
    require(!stack.contains((tpe, name)),
      s"template '$name' ($tpe): cyclic expansion depth — the template " +
        s"expands to itself (chain: ${stack.reverse.map(_._2).mkString(" -> ")} -> $name)")
    inProgress.set((tpe, name) :: stack)
    try body finally inProgress.set(stack)
  }

  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  // expansion is PURE in (template, resolved fields, env) — memoize it:
  // a config that uses the same templated component N times (the RAG
  // gate's per-request retrieval pipeline) pays the one-row evaluation
  // job once
  private val expandCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String,
      Map[String, String]), JsonNode]

  /** Expand the template against a user config node → the concrete
    * component config (a single-key object, compiled by the normal
    * component dispatch).
    */
  def expand(spark: SparkSession, t: Template, cfg: JsonNode,
             env: Map[String, String] = Map.empty): JsonNode = {
    require(depth.get < 10,
      s"template '${t.name}': expansion depth > 10 (self-referential?)")
    depth.set(depth.get + 1)
    try {
      val fields = fieldsObject(t, cfg)
      val key = (t.tpe + ":" + t.name, t.mapping,
        json.writeValueAsString(fields), env)
      expandCache.getOrElseUpdate(key, {
        import spark.implicits._
        val df = Seq(json.writeValueAsString(fields)).toDF("value")
        val rows = graft.blobl.Blobl.mapping(df, t.mapping, env)
          .select("value").collect()
        require(rows.length == 1 && rows(0).getString(0) != null,
          s"template '${t.name}': mapping produced no document")
        val out = json.readTree(rows(0).getString(0))
        require(out.isObject && out.size() >= 1,
          s"template '${t.name}': mapping must build a component object, " +
            s"got $out")
        out
      }).deepCopy[JsonNode]()
    } finally depth.set(depth.get - 1)
  }

  /** Run the template's own `tests` blocks (`rpk connect template lint`):
    * expand each test's config and structurally diff against `expected`.
    * Returns failure descriptions; empty = lint-clean.
    */
  def lint(spark: SparkSession, t: Template): Seq[String] =
    t.tests.flatMap { tc =>
      val name = tc.path("name").asText("(unnamed)")
      try {
        val got = expand(spark, t, tc.path("config"))
        Option(tc.get("expected")) match {
          case Some(want) =>
            diff(normalize(want), got, s"$$") match {
              case Nil => Nil
              case ds => ds.map(d => s"template '${t.name}' test '$name': $d")
            }
          case None => Nil
        }
      } catch {
        case e: Exception =>
          Seq(s"template '${t.name}' test '$name': ${e.getMessage}")
      }
    }

  /** YAML scalars normalize like the engine's own JSON (numbers stay
    * numbers; everything else compares by node equality).
    */
  private def normalize(n: JsonNode): JsonNode = n

  /** Structural diff: every field in `want` must be present and equal in
    * `got` (extra keys in `got` are template-author additions the
    * reference's lint also tolerates via its config-spec defaults).
    */
  private def diff(want: JsonNode, got: JsonNode, at: String): Seq[String] =
    if (want.isObject) {
      if (!got.isObject) Seq(s"$at: expected object, got $got")
      else want.properties().asScala.toSeq.flatMap { e =>
        if (!got.has(e.getKey)) Seq(s"$at.${e.getKey}: missing")
        else diff(e.getValue, got.get(e.getKey), s"$at.${e.getKey}")
      }
    } else if (want.isArray) {
      if (!got.isArray || got.size() != want.size())
        Seq(s"$at: expected array of ${want.size()}, got $got")
      else (0 until want.size()).flatMap(i =>
        diff(want.get(i), got.get(i), s"$at[$i]"))
    } else if (want.isNumber && got.isNumber) {
      if (want.asDouble == got.asDouble) Nil
      else Seq(s"$at: expected $want, got $got")
    } else if (want != got) Seq(s"$at: expected $want, got $got")
    else Nil
}
