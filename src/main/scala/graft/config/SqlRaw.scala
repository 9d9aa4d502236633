package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.blobl.Blobl
import graft.operators.FlowControl
import graft.sources.PgVector

/** The external-database form of `sql_raw` (processors/sql_raw.adoc,
  * outputs/sql_raw.adoc): per message, run one statement or a `queries`
  * list, each with an `args_mapping` (a Bloblang mapping/expression
  * evaluating to the positional-argument array). The processor form
  * replaces the message with the final query's result rows (JSON
  * array); `exec_only` — and the output form — discard results.
  *
  * Engines by DSN:
  *  - `postgres://…` → the in-process [[graft.sources.PgVector]] engine
  *    (pgvector types/operators; the real server's JDBC driver jar is
  *    absent in this environment)
  *  - `jdbc:…` → a real JDBC connection per partition (Derby ships on
  *    the Spark classpath; other dialect jars are env-blocked and their
  *    SQL-text layer is golden-tested in SqlDialectSpec)
  *
  * Scale shape: args evaluate as ONE Catalyst projection (codegen'd);
  * statement execution streams partition-parallel with a connection per
  * partition, exactly like the `sql_insert` processor. The eager
  * localCheckpoint barriers the side effects against stage replay.
  */
object SqlRaw {

  private final case class Q(query: String, argsMapping: Option[String],
                             execOnly: Boolean)

  private def queriesOf(body: JsonNode): Seq[Q] =
    Option(body.get("queries")) match {
      case Some(qs) => qs.elements().asScala.toSeq.map { q =>
        Q(q.get("query").asText,
          Option(q.get("args_mapping")).map(_.asText).filter(_.nonEmpty),
          q.path("exec_only").asBoolean(false))
      }
      case None => Seq(Q(
        Option(body.get("query")).map(_.asText).getOrElse(
          throw new IllegalArgumentException("sql_raw needs query/queries")),
        Option(body.get("args_mapping")).map(_.asText).filter(_.nonEmpty),
        body.path("exec_only").asBoolean(false)))
    }

  /** One statement executor; created per partition (or driver-side for
    * init statements).
    */
  private trait Exec extends AutoCloseable {
    def apply(sql: String, args: Seq[JsonNode]): Seq[JsonNode]
  }

  private def execFor(dsn: String): Exec =
    if (dsn.startsWith("postgres://") || dsn.startsWith("postgresql://"))
      new Exec {
        def apply(sql: String, args: Seq[JsonNode]): Seq[JsonNode] =
          PgVector.exec(dsn, sql, args)
        def close(): Unit = ()
      }
    else if (dsn.startsWith("jdbc:"))
      new Exec {
        private val conn = java.sql.DriverManager.getConnection(dsn)
        def apply(sql: String, args: Seq[JsonNode]): Seq[JsonNode] = {
          val ps = conn.prepareStatement(sql)
          try {
            args.zipWithIndex.foreach { case (a, i) =>
              if (a == null || a.isNull) ps.setObject(i + 1, null)
              else if (a.isIntegralNumber) ps.setLong(i + 1, a.asLong)
              else if (a.isNumber) ps.setDouble(i + 1, a.asDouble)
              else if (a.isBoolean) ps.setBoolean(i + 1, a.asBoolean)
              else ps.setString(i + 1, a.asText)
            }
            if (ps.execute()) {
              val rs = ps.getResultSet
              val md = rs.getMetaData
              val F = com.fasterxml.jackson.databind.node
                .JsonNodeFactory.instance
              val out = Vector.newBuilder[JsonNode]
              while (rs.next()) {
                val o = F.objectNode()
                (1 to md.getColumnCount).foreach { c =>
                  val name = md.getColumnLabel(c).toLowerCase
                  rs.getObject(c) match {
                    case null => o.set[JsonNode](name, F.nullNode())
                    case n: java.lang.Number if n.longValue == n.doubleValue =>
                      o.put(name, n.longValue)
                    case n: java.lang.Number => o.put(name, n.doubleValue)
                    case b: java.lang.Boolean => o.put(name, b.booleanValue)
                    case v => o.put(name, v.toString)
                  }
                }
                out += o
              }
              rs.close()
              out.result()
            } else Nil
          } finally ps.close()
        }
        def close(): Unit = conn.close()
      }
    else throw new IllegalArgumentException(
      s"sql_raw: dsn '$dsn' — postgres:// (in-process pgvector engine) " +
        "and jdbc: (driver on classpath) are the executable forms here")

  /** Run `init_statement` once, driver-side (statements split on `;`). */
  private def runInit(dsn: String, body: JsonNode): Unit =
    Option(body.get("init_statement")).map(_.asText).filter(_.nonEmpty)
      .foreach { init =>
        val ex = execFor(dsn)
        try init.split(";").map(_.trim).filter(_.nonEmpty)
          .foreach(s => ex(s, Nil))
        finally ex.close()
      }

  /** Processor form: message → final non-exec_only query's rows.
    * Already-errored messages pass through untouched (processor
    * convention); a statement failure errors the MESSAGE.
    */
  def processor(df: DataFrame, body: JsonNode,
                env: Map[String, String]): DataFrame =
    run(df, body, env, discardResults = false, skipErrored = true)

  /** Output form: execute per message (the reference's outputs don't
    * consult the error flag — reject_errored exists for that), results
    * discarded. A statement failure fails the OUTPUT, so wrapping
    * fallback/reject combinators see it.
    */
  def output(df: DataFrame, body: JsonNode): Unit = {
    val tagged = graft.sources.Envelope.ensure(df)
      .withColumn("__err_before", col("error"))
    val res = run(tagged, body, Map.empty, discardResults = true,
      skipErrored = false)
    // only NEW errors (statement failures) fail the output; messages
    // that arrived errored deliver like any other output would
    val bad = res.filter(col("error").isNotNull &&
        col("__err_before").isNull)
      .select(col("error")).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(bad.head.getString(0))
  }

  private def run(df0: DataFrame, body: JsonNode, env: Map[String, String],
                  discardResults: Boolean, skipErrored: Boolean): DataFrame = {
    require(!body.path("unsafe_dynamic_query").asBoolean(false),
      "sql_raw: unsafe_dynamic_query (per-message statement text) is not " +
        "supported — use args_mapping")
    val dsn = body.get("dsn").asText
    val qs = queriesOf(body)
    runInit(dsn, body)
    val df = FlowControl.withErrorChannel(df0)
    val metaCol = if (df.columns.contains("metadata")) Some("metadata")
                  else None
    // args evaluate as Catalyst columns over the whole frame — one
    // codegen'd projection, no per-row interpreter
    val withArgs = qs.zipWithIndex.foldLeft(df) { case (d, (q, i)) =>
      d.withColumn(s"__sqlargs_$i", q.argsMapping match {
        case Some(m) =>
          val expr = m.replaceFirst("^\\s*root\\s*=\\s*", "")
          Blobl.exprJsonText(d, expr, env, metadataCol = metaCol)
        case None => lit("[]")
      })
    }
    val ordered =
      if (withArgs.columns.contains("__seq"))
        withArgs.sortWithinPartitions(col("__seq"))
      else withArgs
    val schema = ordered.schema
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    val vIdx = schema.fieldIndex("value")
    val eIdx = schema.fieldIndex("error")
    val aIdx = qs.indices.map(i => schema.fieldIndex(s"__sqlargs_$i"))
    val queries = qs // serializable copy
    val processed = ordered.mapPartitions { it =>
      if (!it.hasNext) it
      else {
        val mapper = new ObjectMapper()
        val ex = execFor(dsn)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => ex.close()))
        it.map { r =>
          if (skipErrored && r.get(eIdx) != null) r
          else try {
            var result: Seq[JsonNode] = Nil
            var resultSet = false
            queries.zipWithIndex.foreach { case (q, i) =>
              val argsNode = mapper.readTree(r.getString(aIdx(i)))
              val args =
                if (argsNode == null || argsNode.isNull) Nil
                else if (argsNode.isArray)
                  argsNode.elements().asScala.toSeq
                else throw new IllegalArgumentException(
                  s"sql_raw: args_mapping must produce an array, got $argsNode")
              val rows = ex(q.query, args)
              if (!q.execOnly) { result = rows; resultSet = true }
            }
            if (discardResults || !resultSet) r
            else {
              val arr = mapper.createArrayNode()
              result.foreach(arr.add)
              org.apache.spark.sql.Row.fromSeq(
                r.toSeq.updated(vIdx, mapper.writeValueAsString(arr)))
            }
          } catch {
            case e: Exception =>
              org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(eIdx,
                s"sql_raw: ${e.getMessage}"))
          }
        }
      }
    }
    // eager checkpoint barriers the statement side effects against
    // stage replay (the sql_insert convention)
    processed.localCheckpoint()
      .drop(qs.indices.map(i => s"__sqlargs_$i"): _*)
  }
}
