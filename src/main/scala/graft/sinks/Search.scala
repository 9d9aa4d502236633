package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** Elasticsearch/OpenSearch-shaped search output
  * (outputs/elasticsearch_v8.adoc, outputs/opensearch.adoc): documents
  * publish through the public `_bulk` NDJSON API — one action line
  * (`{"index":{"_index":…,"_id":…}}`) plus one source line per
  * message, with `index`, `action` and `id` interpolated per message.
  * Actions: `index`, `create`, `update`, `delete`, `upsert` (upsert =
  * update with `doc_as_upsert`, the v8 output's mapping).
  *
  * Transport is the pluggable [[Http.Client]] (real loopback servers
  * in tests — the http_server convention), so the full request path
  * (NDJSON assembly, chunking, per-item error handling) is exercised
  * without an elasticsearch install.
  *
  * Scale shape: bulk bodies assemble per partition and POST in
  * `batchSize` chunks — executor-side parallel fan-out, the same
  * shape as the reference's BulkIndexer workers; no driver funnel.
  */
object Search {

  /** Append one bulk operation to `sb`. `body` is the raw message
    * JSON: the document for index/create, the update envelope
    * (doc/script/upsert fields) for update/upsert.
    */
  private def bulkOp(sb: StringBuilder, action: String, index: String,
                     id: String, body: String): Unit = {
    val esc = (s: String) => s.replace("\\", "\\\\").replace("\"", "\\\"")
    val head = action match {
      case "upsert" | "update" => "update"
      case a => a
    }
    sb.append(s"""{"$head":{"_index":"${esc(index)}","_id":"${esc(id)}"}}""")
      .append('\n')
    action match {
      case "index" | "create" => sb.append(body).append('\n')
      case "update" => sb.append(body).append('\n')
      case "upsert" =>
        sb.append(s"""{"doc":$body,"doc_as_upsert":true}""").append('\n')
      case "delete" => () // no source line
      case other => throw new IllegalArgumentException(
        s"elasticsearch action '$other' (index|create|update|delete|upsert)")
    }
  }

  /** Bulk-publish `df` — `indexCol`/`actionCol`/`idCol` resolve per
    * row. Any bulk item the endpoint rejects fails the write loudly
    * (an output has no downstream error channel).
    */
  def bulkWrite(df: DataFrame, url: String, indexCol: Column,
                actionCol: Column, idCol: Column,
                valueCol: Column = col("value"), batchSize: Int = 500,
                client: Http.Client = null): Unit = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val prepared = df.select(indexCol.cast("string").as("i"),
      actionCol.cast("string").as("a"), idCol.cast("string").as("id"),
      valueCol.cast("string").as("v"))
    val bulkUrl = url.stripSuffix("/") + "/_bulk"
    val failures = prepared.rdd.mapPartitions { it =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.grouped(batchSize).map { rows =>
        val sb = new StringBuilder
        rows.foreach { r =>
          bulkOp(sb, r.getString(1), r.getString(0), r.getString(2),
            if (r.isNullAt(3)) "null" else r.getString(3))
        }
        val resp = resolved(Seq(Http.Request(bulkUrl, "POST",
          Map("Content-Type" -> "application/x-ndjson"), sb.toString))).head
        if (resp.status < 200 || resp.status > 299)
          rows.length.toLong // whole chunk rejected
        else {
          val root = mapper.readTree(resp.body)
          if (!root.path("errors").asBoolean(false)) 0L
          else {
            import scala.jdk.CollectionConverters._
            root.path("items").elements().asScala.count { item =>
              val op = item.elements().asScala.next()
              val st = op.path("status").asInt(200)
              st < 200 || st > 299
            }.toLong
          }
        }
      }
    }.sum()
    if (failures > 0) throw new IllegalStateException(
      s"elasticsearch output: ${failures.toLong} bulk items rejected")
  }

  /** In-memory search service for `mem://name` URLs — the same
    * named-registry convention as Mongo/Cassandra: executors in the
    * local-mode JVM resolve the shared instance, so oracle gates can
    * drive the REAL bulk request path (NDJSON assembly → items
    * envelope → per-item status handling) without a socket. The spec
    * suite keeps its own independent loopback HTTP server so the wire
    * contract is verified against a second implementation.
    */
  final class MemES {
    import scala.collection.mutable
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val docs: mutable.LinkedHashMap[(String, String), String] =
      mutable.LinkedHashMap.empty

    /** Apply a _bulk NDJSON body, return the items-envelope JSON. */
    def applyBulk(body: String): Http.Response = docs.synchronized {
      val lines = body.split("\n").toSeq.filter(_.nonEmpty).iterator
      val items = Vector.newBuilder[String]
      var anyError = false
      while (lines.hasNext) {
        val action = mapper.readTree(lines.next())
        val op = action.properties().iterator().next()
        val verb = op.getKey
        val index = op.getValue.path("_index").asText
        val id = op.getValue.path("_id").asText
        val key = (index, id)
        def ok(st: Int): Unit =
          items += s"""{"$verb":{"_index":"$index","_id":"$id","status":$st}}"""
        def fail(st: Int): Unit = {
          anyError = true
          items += s"""{"$verb":{"_index":"$index","_id":"$id","status":$st,"error":{"type":"document_level"}}}"""
        }
        verb match {
          case "index" => docs(key) = lines.next(); ok(201)
          case "create" =>
            val src = lines.next()
            if (docs.contains(key)) fail(409)
            else { docs(key) = src; ok(201) }
          case "update" =>
            val env = mapper.readTree(lines.next())
            val partial = env.path("doc")
            if (docs.contains(key)) {
              val merged = mapper.readTree(docs(key))
                .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
              merged.setAll(partial
                .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
              docs(key) = merged.toString; ok(200)
            } else if (env.path("doc_as_upsert").asBoolean(false)) {
              docs(key) = partial.toString; ok(201)
            } else fail(404)
          case "delete" =>
            if (docs.remove(key).isDefined) ok(200) else fail(404)
          case other => fail(400)
        }
      }
      Http.Response(200,
        s"""{"took":1,"errors":$anyError,"items":[${items.result().mkString(",")}]}""")
    }

    def rows(index: String): Seq[String] =
      docs.synchronized {
        docs.toSeq.collect { case ((i, _), doc) if i == index => doc }
      }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemES]()

  def named(name: String): MemES =
    registry.computeIfAbsent(name, _ => new MemES)
  def drop(name: String): Unit = registry.remove(name)

  /** mem://name client: routes _bulk POSTs to the named instance. */
  def memClient(name: String): Http.Client = reqs => reqs.map { q =>
    named(name).applyBulk(q.body)
  }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.clientFor(url)
}
