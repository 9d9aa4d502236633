package graft.config

import graft.SparkSpec

/** Config templates (docs/modules/configuration/pages/templating.adoc,
  * internal/template/template.go): parse, field resolution, Bloblang
  * expansion, embedded `tests` lint, and end-to-end use through the
  * YAML runner — including the reference's own RAG template files.
  */
class TemplateSpec extends SparkSpec {

  private val refTemplates = "/root/reference/config/rag/templates"

  private def hasRef = java.nio.file.Files.isDirectory(
    java.nio.file.Paths.get(refTemplates))

  // templating.adoc's own worked example
  private val sqsListTemplate =
    """name: aws_sqs_list
      |type: input
      |fields:
      |  - name: urls
      |    type: string
      |    kind: list
      |  - name: region
      |    type: string
      |    default: us-east-1
      |mapping: |
      |  root.broker.inputs = this.urls.map_each(url -> {
      |    "aws_sqs": {
      |      "url": url,
      |      "region": this.region,
      |    }
      |  })
      |""".stripMargin

  test("templating.adoc example expands to the documented broker config") {
    val t = Templates.parse(sqsListTemplate)
    assert(t.name == "aws_sqs_list" && t.tpe == "input")
    val cfg = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      """{"urls": ["https://q/1", "https://q/2"]}""")
    val out = Templates.expand(spark, t, cfg)
    assert(out.at("/broker/inputs/0/aws_sqs/url").asText == "https://q/1")
    assert(out.at("/broker/inputs/1/aws_sqs/region").asText == "us-east-1")
    assert(out.at("/broker/inputs").size == 2)
  }

  test("missing required field and unrecognized field are errors") {
    val t = Templates.parse(sqsListTemplate)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val e1 = intercept[IllegalArgumentException] {
      Templates.expand(spark, t, m.readTree("""{"region": "eu-west-1"}"""))
    }
    assert(e1.getMessage.contains("'urls' is required"))
    val e2 = intercept[IllegalArgumentException] {
      Templates.expand(spark, t,
        m.readTree("""{"urls": [], "regoin": "typo"}"""))
    }
    assert(e2.getMessage.contains("unrecognized field 'regoin'"))
  }

  test("reference RAG templates parse and their embedded tests lint clean") {
    assume(hasRef)
    val ts = Templates.registerDir(refTemplates)
    assert(ts.map(_.name).toSet ==
      Set("pgvector", "oai_embed", "cohere_embed", "ollama_embed",
        "rag_topics"))
    // pgvector registers twice: output (pgvector_output.yaml) and
    // processor (pgvector_query.yaml)
    assert(Templates.lookup("output", "pgvector").nonEmpty)
    assert(Templates.lookup("processor", "pgvector").nonEmpty)
    assert(Templates.lookup("input", "rag_topics").nonEmpty)
    val failures = ts.flatMap(Templates.lint(spark, _))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("reference template_examples parse and their embedded tests lint") {
    val dir = "/root/reference/config/template_examples"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
    val ts = Templates.registerDir(dir)
    assert(ts.map(_.name).toSet == Set("dead_letter", "stdin_uppercase",
      "hydration", "log_and_drop", "log_message", "plugin_alias",
      "aws_sqs_list"))
    val failures = ts.flatMap(Templates.lint(spark, _))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("templated input runs through the YAML runner") {
    Templates.register(
      """name: gen_range
        |type: input
        |fields:
        |  - name: n
        |    type: int
        |  - name: prefix
        |    type: string
        |    default: row
        |mapping: |
        |  root.generate = {
        |    "count": this.n,
        |    "mapping": "root.id = \"%s-\" + this.seq.string()".format(this.prefix),
        |  }
        |""".stripMargin)
    val out = Pipeline.build(spark,
      """input:
        |  gen_range:
        |    n: 3
        |pipeline:
        |  processors:
        |    - mapping: 'root = this.id'
        |""".stripMargin)
    val vals = out.select("value").collect().map(_.getString(0)).sorted
    assert(vals.toSeq == Seq("row-0", "row-1", "row-2"))
  }

  test("templated processor expands lazily and composes with builtins") {
    Templates.register(
      """name: tag_with
        |type: processor
        |fields:
        |  - name: tag
        |    type: string
        |mapping: |
        |  root.mutation = "root.tag = \"%s\"".format(this.tag)
        |""".stripMargin)
    val out = Pipeline.build(spark,
      """input:
        |  generate: { count: 2, mapping: 'root.v = this.seq' }
        |pipeline:
        |  processors:
        |    - tag_with: { tag: hello }
        |""".stripMargin)
    val rows = out.select("value").collect().map(_.getString(0))
    assert(rows.length == 2 && rows.forall(_.contains("\"tag\":\"hello\"")))
  }

  test("string coercion: unquoted YAML numbers reach string fields as text") {
    assume(hasRef)
    val t = Templates.lookup("input", "rag_topics").getOrElse(
      Templates.registerFile(s"$refTemplates/redpanda.yaml"))
    val cfg = new ObjectMapperShim().read(
      """{"seed_brokers": "b:9092", "consumer_group": "g",
        | "user": "me", "password": 12345}""".stripMargin)
    val out = Templates.expand(spark, t, cfg)
    assert(out.at("/kafka_franz/sasl/0/password").asText == "12345")
    assert(out.at("/kafka_franz/sasl/0/mechanism").asText == "SCRAM-SHA-256")
    assert(out.at("/kafka_franz/tls/enabled").asBoolean)
  }

  test("expansion depth guard trips on self-referential templates") {
    Templates.register(
      """name: ouroboros
        |type: processor
        |fields: []
        |mapping: |
        |  root.ouroboros = {}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark,
        """input:
          |  generate: { count: 1, mapping: 'root = "x"' }
          |pipeline:
          |  processors:
          |    - ouroboros: {}
          |""".stripMargin).collect()
    }
    assert(e.getMessage.contains("cyclic"))
  }
}

/** Tiny YAML/JSON reader for specs (jackson is already on the classpath). */
class ObjectMapperShim {
  private val m = new com.fasterxml.jackson.databind.ObjectMapper(
    new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
  def read(s: String): com.fasterxml.jackson.databind.JsonNode = m.readTree(s)
}
