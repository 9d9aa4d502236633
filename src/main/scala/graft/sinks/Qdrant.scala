package graft.sinks

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `qdrant` output (reference internal/impl/qdrant, 870 LoC — rides
  * the qdrant gRPC client; this speaks the PUBLIC REST API, the same
  * documented surface): `PUT /collections/{c}` (create with vector
  * size + distance), `PUT /collections/{c}/points?wait=true` (batch
  * upsert, insert-or-replace by id), `POST …/points/search` (top-k
  * with scores), `POST …/points/delete`, `POST …/points/count` —
  * `api-key` header auth enforced, envelope `{"status":"ok","result":
  * …}` on every response, 404 for unknown collections and 400 for
  * dimension mismatches (the server-side validations qdrant applies).
  *
  * Scale shape: executor-side batched upserts per partition (no
  * driver funnel), searches batched inside mapPartitions — the
  * [[Pinecone]] distribution class.
  */
object Qdrant {

  /** Create a collection (idempotent PUT, the qdrant shape). */
  def createCollection(url: String, apiKey: String, collection: String,
                       dim: Int, distance: String = "Cosine",
                       client: Http.Client = null): Unit = {
    val c = Option(client).getOrElse(resolveClient(url))
    val r = c(Seq(Http.Request(
      s"${url.stripSuffix("/")}/collections/$collection", "PUT",
      headers(apiKey),
      s"""{"vectors":{"size":$dim,"distance":"$distance"}}"""))).head
    if (r.status / 100 != 2) throw new IllegalStateException(
      s"qdrant create $collection: ${r.status} ${r.body.take(200)}")
  }

  private def headers(apiKey: String) =
    Map("Content-Type" -> "application/json", "api-key" -> apiKey)

  /** Batch-upsert points (insert-or-replace by id). */
  def write(df: DataFrame, url: String, apiKey: String, collection: String,
            idCol: Column, vectorCol: Column, payloadCol: Column = null,
            batchSize: Int = 100, client: Http.Client = null): Unit = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val prepared = df.select(idCol.cast("long").as("id"),
      vectorCol.cast("array<float>").as("v"),
      (if (payloadCol == null) lit(null).cast("string")
       else to_json(payloadCol)).as("p"))
    prepared.rdd.foreachPartition { it =>
      it.grouped(batchSize).foreach { rows =>
        val points = rows.map { r =>
          val payload =
            if (r.isNullAt(2)) "" else s""","payload":${r.getString(2)}"""
          s"""{"id":${r.getLong(0)},"vector":[${
            r.getSeq[Float](1).mkString(",")}]$payload}"""
        }.mkString(",")
        val resp = resolved(Seq(Http.Request(
          s"$base/collections/$collection/points?wait=true", "PUT",
          headers(apiKey), s"""{"points":[$points]}"""))).head
        if (resp.status / 100 != 2) throw new IllegalStateException(
          s"qdrant upsert rejected (${resp.status}): ${resp.body.take(200)}")
      }
    }
  }

  def delete(url: String, apiKey: String, collection: String,
             ids: Seq[Long], client: Http.Client = null): Unit = {
    val c = Option(client).getOrElse(resolveClient(url))
    val r = c(Seq(Http.Request(
      s"${url.stripSuffix("/")}/collections/$collection/points/delete",
      "POST", headers(apiKey),
      s"""{"points":[${ids.mkString(",")}]}"""))).head
    if (r.status / 100 != 2) throw new IllegalStateException(
      s"qdrant delete: ${r.status} ${r.body.take(200)}")
  }

  def count(url: String, apiKey: String, collection: String,
            client: Http.Client = null): Long = {
    val c = Option(client).getOrElse(resolveClient(url))
    val r = c(Seq(Http.Request(
      s"${url.stripSuffix("/")}/collections/$collection/points/count",
      "POST", headers(apiKey), """{"exact":true}"""))).head
    if (r.status != 200) throw new IllegalStateException(
      s"qdrant count: ${r.status}")
    new ObjectMapper().readTree(r.body).at("/result/count").asLong
  }

  /** Enrich each row with store-side top-k — hits as
    * `array<struct<id:long,score:double>>`.
    */
  def searchEnrich(df: DataFrame, url: String, apiKey: String,
                   collection: String, vectorCol: String, topK: Int,
                   outCol: String, client: Http.Client = null): DataFrame = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val enriched = df.withColumn("__qv", col(vectorCol).cast("array<float>"))
    import org.apache.spark.sql.types._
    val schema = StructType(enriched.schema.fields :+
      StructField(outCol, DataTypes.createArrayType(StructType(Seq(
        StructField("id", LongType), StructField("score", DoubleType))))))
    val out = enriched.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.grouped(50).flatMap { rows =>
        val resps = resolved(rows.map { r =>
          val v = r.getSeq[Float](r.fieldIndex("__qv")).mkString(",")
          Http.Request(s"$base/collections/$collection/points/search",
            "POST", headers(apiKey),
            s"""{"vector":[$v],"limit":$topK,"with_payload":false}""")
        })
        rows.zip(resps).map { case (r, resp) =>
          if (resp.status != 200) throw new IllegalStateException(
            s"qdrant search failed (${resp.status}): ${resp.body.take(200)}")
          val hits = mapper.readTree(resp.body).path("result")
            .elements().asScala.map { m =>
              Row(m.path("id").asLong, m.path("score").asDouble)
            }.toSeq
          Row.fromSeq(r.toSeq :+ hits)
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)))
    out.drop("__qv")
  }

  // ───────────────────── in-memory REST service ─────────────────────

  /** Enforces api-key auth, collection existence, vector dimension,
    * and the response envelope.
    */
  final class MemQdrant(apiKey: String) {
    private val m = new ObjectMapper()
    private final case class Coll(dim: Int, distance: String,
      points: mutable.LinkedHashMap[Long, (Array[Float], String)] =
        mutable.LinkedHashMap.empty)
    private val colls = mutable.LinkedHashMap.empty[String, Coll]
    @volatile var rejected = 0

    def pointCount(c: String): Int =
      synchronized(colls.get(c).map(_.points.size).getOrElse(0))

    private def okEnvelope(result: String) =
      Http.Response(200, s"""{"result":$result,"status":"ok","time":0.0}""")
    private def fail(status: Int, msg: String) =
      Http.Response(status,
        s"""{"status":{"error":"$msg"},"time":0.0}""")

    def handle(q: Http.Request): Http.Response = synchronized {
      if (!q.headers.get("api-key").contains(apiKey)) {
        rejected += 1
        return fail(401, "Must provide an API key")
      }
      val path = q.url.stripPrefix("mem://").dropWhile(_ != '/')
        .takeWhile(_ != '?')
      val segs = path.stripPrefix("/").split("/")
      if (segs.length < 2 || segs(0) != "collections")
        return fail(404, s"no route: $path")
      val name = segs(1)
      (q.verb, segs.drop(2).toList) match {
        case ("PUT", Nil) =>
          val spec = m.readTree(q.body).path("vectors")
          colls(name) = Coll(spec.path("size").asInt,
            spec.path("distance").asText("Cosine"))
          okEnvelope("true")
        case ("PUT", List("points")) =>
          val coll = colls.getOrElse(name,
            return fail(404, s"Collection `$name` doesn't exist"))
          val pts = m.readTree(q.body).path("points").elements().asScala
          pts.foreach { p =>
            val vec = p.path("vector").elements().asScala
              .map(_.floatValue).toArray
            if (vec.length != coll.dim)
              return fail(400,
                s"Wrong vector dimension: expected ${coll.dim}, got ${vec.length}")
            coll.points(p.path("id").asLong) =
              (vec, Option(p.get("payload")).map(_.toString).orNull)
          }
          okEnvelope("""{"operation_id":0,"status":"completed"}""")
        case ("POST", List("points", "search")) =>
          val coll = colls.getOrElse(name,
            return fail(404, s"Collection `$name` doesn't exist"))
          val req = m.readTree(q.body)
          val v = req.path("vector").elements().asScala
            .map(_.floatValue).toArray
          if (v.length != coll.dim)
            return fail(400, "Wrong vector dimension")
          val limit = req.path("limit").asInt(10)
          val scored = coll.points.toSeq.map { case (id, (pv, _)) =>
            (id, cosine(v, pv))
          }.sortBy { case (id, s) => (-s, id) }.take(limit)
          okEnvelope(scored.map { case (id, s) =>
            s"""{"id":$id,"version":0,"score":$s}"""
          }.mkString("[", ",", "]"))
        case ("POST", List("points", "delete")) =>
          val coll = colls.getOrElse(name,
            return fail(404, s"Collection `$name` doesn't exist"))
          m.readTree(q.body).path("points").elements().asScala
            .foreach(id => coll.points.remove(id.asLong))
          okEnvelope("""{"operation_id":0,"status":"completed"}""")
        case ("POST", List("points", "count")) =>
          val coll = colls.getOrElse(name,
            return fail(404, s"Collection `$name` doesn't exist"))
          okEnvelope(s"""{"count":${coll.points.size}}""")
        case other => fail(404, s"no route: $other")
      }
    }

    private def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemQdrant]()

  def register(name: String, apiKey: String): MemQdrant =
    registry.computeIfAbsent(name, _ => new MemQdrant(apiKey))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handle(r))
          .getOrElse(Http.Response(404, "no such qdrant"))
      }
    } else Http.javaClient()
}
