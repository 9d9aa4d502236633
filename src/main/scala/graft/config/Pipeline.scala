package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blobl.Blobl
import graft.operators.{BatchOps, Jq, Observe}
import graft.sinks.Sinks
import graft.sources.Sources

/** Declarative pipeline runner — the reference's primary UX
  * (README.md:7-21: a YAML config of input → pipeline.processors →
  * output) compiled to ONE Spark plan and executed.
  *
  * ```yaml
  * input:
  *   generate: { count: 100, mapping: 'root.id = this.seq' }
  * pipeline:
  *   processors:
  *     - mapping: 'root.double = this.id * 2'
  *     - jq: 'select(.double > 10)'
  * output:
  *   parquet: { path: /tmp/out }
  * ```
  *
  * Inputs: generate, file (csv/json/parquet/lines). Outputs: parquet,
  * csv, json, noop (evaluate + discard), memory (named temp view).
  * Processor vocabulary in [[Processors.compile]] — shared with the
  * declarative unit-test harness, so a config users test with
  * `tests:` blocks runs IDENTICALLY in production.
  */
object Pipeline {

  private val yaml = new ObjectMapper(new YAMLFactory())

  final case class Spec(input: JsonNode, processors: Seq[JsonNode],
                        output: Option[JsonNode])

  def load(configYaml: String): Spec = {
    val root = yaml.readTree(configYaml)
    val input = Option(root.get("input")).getOrElse(
      throw new IllegalArgumentException("config needs an input"))
    val procs = Option(root.at("/pipeline/processors"))
      .filterNot(_.isMissingNode)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    Spec(input, procs, Option(root.get("output")))
  }

  /** Build the full DataFrame (input + processors), unexecuted. */
  def build(spark: SparkSession, configYaml: String,
            env: Map[String, String] = Map.empty): DataFrame = {
    val spec = load(configYaml)
    val src = compileInput(spark, spec.input, env)
    spec.processors.foldLeft(src)((df, p) => Processors.compile(p, env)(df))
  }

  /** Build and execute through the output; returns the final frame. */
  def run(spark: SparkSession, configYaml: String,
          env: Map[String, String] = Map.empty): DataFrame = {
    val spec = load(configYaml)
    val df = build(spark, configYaml, env)
    spec.output.foreach(writeOutput(df, _))
    df
  }

  /** STREAMING form: the same config shape with a streaming input
    * (`generate: {rate: rowsPerSecond, mapping}` or
    * `file: {path, format, schema}` tail-read) and a streaming output
    * (`memory: {name}` or `parquet: {path, checkpoint}`). Processors are
    * the same vocabulary — they compile to projections/filters that run
    * identically per micro-batch.
    */
  def runStream(spark: SparkSession, configYaml: String,
                env: Map[String, String] = Map.empty): org.apache.spark.sql.streaming.StreamingQuery = {
    val spec = load(configYaml)
    val src = one(spec.input) match {
      case ("generate", b) =>
        Sources.generateStream(spark, b.path("rate").asInt(10),
          b.get("mapping").asText, env)
      case ("file", b) =>
        val fmt = b.path("format").asText("parquet")
        val schema = b.get("schema").asText
        fmt match {
          case "parquet" => Sources.parquetStream(spark, b.get("path").asText, schema)
          case "csv" => Sources.csvStream(spark, b.get("path").asText, schema)
          case other => throw new IllegalArgumentException(s"stream format: $other")
        }
      case (other, _) =>
        throw new IllegalArgumentException(s"streaming input '$other' not supported")
    }
    val df = spec.processors.foldLeft(src)((d, p) => Processors.compile(p, env)(d))
    val out = spec.output.getOrElse(
      throw new IllegalArgumentException("streaming config needs an output"))
    one(out) match {
      case ("memory", b) =>
        df.writeStream.format("memory").queryName(b.get("name").asText)
          .outputMode("append").start()
      case ("parquet", b) =>
        Sinks.parquetStream(df, b.get("path").asText,
          b.get("checkpoint").asText)
      case (other, _) =>
        throw new IllegalArgumentException(s"streaming output '$other' not supported")
    }
  }

  private def one(n: JsonNode): (String, JsonNode) = {
    val fields = n.properties().asScala.toSeq
    require(fields.size == 1, s"component must have exactly one key: $n")
    (fields.head.getKey, fields.head.getValue)
  }

  private def compileInput(spark: SparkSession, n: JsonNode,
                           env: Map[String, String]): DataFrame =
    one(n) match {
      case ("generate", b) =>
        Sources.generate(spark, b.get("count").asLong,
          b.get("mapping").asText, env)
      case ("file", b) =>
        val path = b.get("path").asText
        b.path("format").asText("lines") match {
          case "csv" => Sources.csv(spark, path)
          case "json" => Sources.jsonLines(spark, path)
          case "parquet" => Sources.parquet(spark, path)
          case "lines" | "" => Sources.lines(spark, path)
          case other => throw new IllegalArgumentException(s"file format: $other")
        }
      case (other, _) =>
        throw new IllegalArgumentException(s"input '$other' not supported")
    }

  private def writeOutput(df: DataFrame, n: JsonNode): Unit = one(n) match {
    case ("parquet", b) => Sinks.parquet(df, b.get("path").asText)
    case ("csv", b) => Sinks.csv(df, b.get("path").asText)
    case ("json", b) => Sinks.jsonLines(df, b.get("path").asText)
    case ("noop", _) =>
      df.write.format("noop").mode("overwrite").save()
    case ("memory", b) =>
      df.createOrReplaceTempView(b.get("name").asText)
    case (other, _) =>
      throw new IllegalArgumentException(s"output '$other' not supported")
  }
}

/** Config-form processor vocabulary, shared by [[Pipeline]] and the
  * declarative test harness ([[graft.testkit.DeclarativeTest]]).
  */
object Processors {

  def compile(p: JsonNode, env: Map[String, String]): DataFrame => DataFrame = {
    val fields = p.properties().asScala.toSeq
    require(fields.size == 1, s"processor must have exactly one key: $p")
    val (kind, body) = (fields.head.getKey, fields.head.getValue)
    kind match {
      case "mapping" | "bloblang" =>
        df => Blobl.mapping(df, body.asText, env,
          metadataCol = metaColOf(df))
      case "mutation" =>
        df => Blobl.mutation(df, body.asText, env,
          metadataCol = metaColOf(df))
      case "jq" =>
        df => Jq.run(df, body.asText, "value", "value")
      case "noop" => identity
      case "bounds_check" =>
        val min = body.path("min").asInt(0)
        val max = body.path("max").asInt(Int.MaxValue)
        df => BatchOps.boundsCheck(df, col("value"), min, max)
      case "json_schema" =>
        val schema = body.toString
        df => {
          graft.functions.expressions.GraftFunctions.register(df.sparkSession)
          df.filter(call_function("graft_json_schema_check",
            col("value"), lit(schema)).isNull)
        }
      case "log" =>
        df => Observe.logSample(df, every = body.path("every").asLong(1000),
          prefix = body.path("prefix").asText("pipeline"))
      case "parse_log" =>
        // processors/parse_log.adoc:26 — syslog line → structured JSON
        val fmt = body.path("format").asText("syslog_rfc5424")
        val f = if (fmt.contains("3164")) "rfc3164" else "rfc5424"
        df => df.withColumn("value",
          to_json(graft.functions.CodecFunctions.parseSyslog(col("value"), f)))
      case other => throw new IllegalArgumentException(
        s"processor '$other' not supported in config form yet")
    }
  }

  private def metaColOf(df: DataFrame): Option[String] =
    if (df.columns.contains("metadata")) Some("metadata") else None
}
