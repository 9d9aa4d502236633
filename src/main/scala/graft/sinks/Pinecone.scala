package graft.sinks

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** Pinecone-shaped vector output
  * (internal/impl/pinecone/output.go:33-101 — contract only, no code
  * ported: the reference wraps the official Go SDK; this speaks the
  * PUBLIC data-plane REST shapes directly):
  *
  *   - `upsert-vectors` → POST /vectors/upsert
  *     `{"vectors":[{"id","values","metadata"}],"namespace"}`
  *   - `update-vector`  → POST /vectors/update
  *     `{"id","values","setMetadata","namespace"}` (must exist)
  *   - `delete-vectors` → POST /vectors/delete `{"ids":[…],"namespace"}`
  *
  * plus the /query read used by the oracle gate. `id` and `namespace`
  * resolve per row (the reference's interpolated fields);
  * `vector_mapping` is a Column (we ARE the mapping language here).
  *
  * Scale shape: vectors batch per partition and POST in `batchSize`
  * chunks — executor-side fan-out over the pluggable [[Http.Client]],
  * no driver funnel, same distribution class as the reference's
  * batched writer.
  */
object Pinecone {

  /** One write op per input row; `op` ∈ upsert-vectors / update-vector
    * / delete-vectors (the reference's `operation` enum).
    */
  def write(df: DataFrame, url: String, op: String, idCol: Column,
            vectorCol: Column = null, metadataCol: Column = null,
            namespace: String = "", batchSize: Int = 100,
            client: Http.Client = null): Unit = {
    require(Set("upsert-vectors", "update-vector", "delete-vectors")(op),
      s"pinecone: invalid operation '$op'")
    require(op == "delete-vectors" || vectorCol != null,
      "pinecone: vector_mapping required unless deleting")
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val prepared = df.select(
      idCol.cast("string").as("id"),
      (if (vectorCol == null) lit(null).cast("array<float>")
       else vectorCol.cast("array<float>")).as("v"),
      (if (metadataCol == null) lit(null).cast("string")
       else to_json(metadataCol)).as("m"))
    prepared.rdd.foreachPartition { it =>
      it.grouped(batchSize).foreach { rows =>
        val resp = op match {
          case "upsert-vectors" =>
            val vectors = rows.map(vectorJson).mkString(",")
            resolved(Seq(Http.Request(s"$base/vectors/upsert", "POST",
              Map("Content-Type" -> "application/json"),
              s"""{"vectors":[$vectors],"namespace":"$namespace"}"""))).head
          case "update-vector" =>
            // the API updates one vector per request
            val rs = resolved(rows.map { r =>
              val vals = valuesJson(r)
              val meta = if (r.isNullAt(2)) "" else s""","setMetadata":${r.getString(2)}"""
              Http.Request(s"$base/vectors/update", "POST",
                Map("Content-Type" -> "application/json"),
                s"""{"id":"${r.getString(0)}"$vals$meta,"namespace":"$namespace"}""")
            })
            rs.find(r => r.status < 200 || r.status > 299).getOrElse(rs.head)
          case "delete-vectors" =>
            val ids = rows.map(r => "\"" + r.getString(0) + "\"").mkString(",")
            resolved(Seq(Http.Request(s"$base/vectors/delete", "POST",
              Map("Content-Type" -> "application/json"),
              s"""{"ids":[$ids],"namespace":"$namespace"}"""))).head
        }
        if (resp.status < 200 || resp.status > 299)
          throw new IllegalStateException(
            s"pinecone $op rejected (${resp.status}): ${resp.body.take(200)}")
      }
    }
  }

  private def valuesJson(r: Row): String =
    if (r.isNullAt(1)) ""
    else s""","values":[${r.getSeq[Float](1).mkString(",")}]"""

  private def vectorJson(r: Row): String = {
    val meta = if (r.isNullAt(2)) "" else s""","metadata":${r.getString(2)}"""
    s"""{"id":"${r.getString(0)}","values":[${
      if (r.isNullAt(1)) "" else r.getSeq[Float](1).mkString(",")}]$meta}"""
  }

  /** Enrich each query row with store-side cosine top-k via /query —
    * hits land as `array<struct<id:string,score:double>>`.
    */
  def queryEnrich(df: DataFrame, url: String, vectorCol: String, topK: Int,
                  outCol: String, namespace: String = "",
                  client: Http.Client = null): DataFrame = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val enriched = df.withColumn("__qv", col(vectorCol).cast("array<float>"))
    val schema = org.apache.spark.sql.types.StructType(enriched.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.DataTypes.createArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("score",
              org.apache.spark.sql.types.DoubleType))))))
    val out = enriched.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.grouped(50).flatMap { rows =>
        val resps = resolved(rows.map { r =>
          val v = r.getSeq[Float](r.fieldIndex("__qv")).mkString(",")
          Http.Request(s"$base/query", "POST",
            Map("Content-Type" -> "application/json"),
            s"""{"namespace":"$namespace","topK":$topK,"vector":[$v]}""")
        })
        rows.zip(resps).map { case (r, resp) =>
          if (resp.status != 200) throw new IllegalStateException(
            s"pinecone query failed (${resp.status}): ${resp.body.take(200)}")
          val root = mapper.readTree(resp.body)
          import scala.jdk.CollectionConverters._
          val hits = root.path("matches").elements().asScala.map { m =>
            Row(m.path("id").asText, m.path("score").asDouble)
          }.toSeq
          Row.fromSeq(r.toSeq :+ hits)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)))
    out.drop("__qv")
  }

  // ---- in-memory data plane (mem://name) ----

  /** Stores namespace → id → (values, metadataJson) and implements the
    * four endpoint shapes. Update of a missing id is a 404 (the API's
    * behavior); upsert inserts-or-replaces.
    */
  final class MemIndex {
    private val mapper = new ObjectMapper()
    val namespaces: mutable.LinkedHashMap[String,
      mutable.LinkedHashMap[String, (Array[Float], String)]] =
      mutable.LinkedHashMap.empty

    private def ns(name: String) = namespaces.getOrElseUpdate(name,
      mutable.LinkedHashMap.empty)

    def handle(q: Http.Request): Http.Response = synchronized {
      val path = q.url.dropWhile(_ != '/')
      val root = mapper.readTree(q.body)
      val nsName = root.path("namespace").asText("")
      path match {
        case p if p.endsWith("/vectors/upsert") =>
          val space = ns(nsName)
          var n = 0
          root.path("vectors").forEach { v =>
            val vals = valuesOf(v.path("values"))
            val meta = if (v.has("metadata")) v.path("metadata").toString else null
            space(v.path("id").asText) = (vals, meta)
            n += 1
          }
          Http.Response(200, s"""{"upsertedCount":$n}""")
        case p if p.endsWith("/vectors/update") =>
          val space = ns(nsName)
          val id = root.path("id").asText
          space.get(id) match {
            case None => Http.Response(404,
              s"""{"code":5,"message":"vector not found: $id"}""")
            case Some((vals, meta)) =>
              val nv = if (root.has("values")) valuesOf(root.path("values"))
                       else vals
              val nm = if (root.has("setMetadata"))
                root.path("setMetadata").toString else meta
              space(id) = (nv, nm)
              Http.Response(200, "{}")
          }
        case p if p.endsWith("/vectors/delete") =>
          val space = ns(nsName)
          if (root.path("deleteAll").asBoolean(false)) space.clear()
          else root.path("ids").forEach(i => space.remove(i.asText))
          Http.Response(200, "{}")
        case p if p.endsWith("/query") =>
          val space = ns(nsName)
          val qv = valuesOf(root.path("vector"))
          val k = root.path("topK").asInt(10)
          val scored = space.toSeq.map { case (id, (v, _)) =>
            (id, cosine(qv, v))
          }.sortBy { case (id, s) =>
            (-s, id.toLongOption.getOrElse(Long.MaxValue), id)
          }.take(k)
          val matches = scored.map { case (id, s) =>
            s"""{"id":"$id","score":$s}"""
          }.mkString(",")
          Http.Response(200, s"""{"matches":[$matches],"namespace":"$nsName"}""")
        case other =>
          Http.Response(404, s"""{"message":"no handler for $other"}""")
      }
    }

    private def valuesOf(n: com.fasterxml.jackson.databind.JsonNode): Array[Float] = {
      val out = Array.newBuilder[Float]
      n.forEach(e => out += e.floatValue())
      out.result()
    }

    private def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemIndex]()

  def named(name: String): MemIndex =
    registry.computeIfAbsent(name, _ => new MemIndex)
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(named(name).handle)

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.clientFor(url)
}
