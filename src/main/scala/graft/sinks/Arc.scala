package graft.sinks

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.CodecOps
import graft.operators.Http

/** `arc` output (internal/impl/arc/output.go — contract only, no
  * code ported): batches POST to Arc's public
  * `/api/v1/write/msgpack` ingestion endpoint as MessagePack with a
  * Bearer token and the `x-arc-database` header. Two payload shapes:
  *
  *   - `columnar` (default): messages grouped by interpolated
  *     measurement, transposed to
  *     `{"batch":[{"m":…,"columns":{col:[v…]}}]}` — equal-length
  *     column arrays, validated server-side;
  *   - `row`: `{"batch":[{"m":…,"fields":{…}}]}` per message.
  *
  * Encoding rides the engine's own msgpack codec
  * (CodecOps.msgpackEncode — the hand-rolled wire implementation the
  * p_msgpack gate verifies), so the bytes on the wire are the same
  * family the reference emits. Optional gzip Content-Encoding.
  *
  * Scale shape: per-partition chunked POSTs — executor-side fan-out.
  */
object Arc {

  def write(df: DataFrame, url: String, database: String,
            measurementCol: Column, format: String = "columnar",
            token: String = "", gzip: Boolean = false,
            batchSize: Int = 1000, client: Http.Client = null): Unit = {
    require(Set("columnar", "row")(format), s"arc: bad format '$format'")
    require(!token.contains("\n") && !token.contains("\r"),
      "arc: token contains invalid characters")
    val resolved = Option(client).getOrElse(resolveClient(url))
    val endpoint = url.stripSuffix("/") + "/api/v1/write/msgpack"
    val fmt = format
    val headers = Map("Content-Type" -> "application/msgpack",
      "x-arc-database" -> database) ++
      (if (token.nonEmpty) Map("Authorization" -> s"Bearer $token")
       else Map.empty[String, String]) ++
      (if (gzip) Map("Content-Encoding" -> "gzip")
       else Map.empty[String, String])
    df.select(measurementCol.cast("string").as("m"),
        col("value").cast("string").as("v"))
      .rdd.foreachPartition { it =>
        val mapper = new ObjectMapper()
        it.grouped(batchSize).foreach { rows =>
          val payloadJson =
            if (fmt == "columnar") columnarJson(mapper, rows)
            else rowJson(mapper, rows)
          var body = CodecOps.msgpackEncode(
            org.apache.spark.unsafe.types.UTF8String.fromString(payloadJson))
          if (gzip) {
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(body); gz.close()
            body = bos.toByteArray
          }
          val resp = resolved(Seq(Http.Request(endpoint, "POST", headers,
            "", bodyBytes = body))).head
          if (resp.status < 200 || resp.status > 299)
            throw new IllegalStateException(
              s"arc write rejected (${resp.status}): ${resp.body.take(200)}")
        }
      }
  }

  /** Group by measurement, transpose to column arrays; a batch whose
    * messages disagree on fields is rejected client-side (the
    * documented columnar constraint).
    */
  private def columnarJson(mapper: ObjectMapper,
                           rows: Seq[org.apache.spark.sql.Row]): String = {
    val groups = mutable.LinkedHashMap.empty[String,
      (Seq[String], mutable.LinkedHashMap[String, mutable.ArrayBuffer[String]])]
    rows.foreach { r =>
      val m = r.getString(0)
      val doc = mapper.readTree(r.getString(1))
      val fieldNames = {
        val out = Seq.newBuilder[String]
        doc.fieldNames().forEachRemaining(out += _)
        out.result()
      }
      val (expected, cols) = groups.getOrElseUpdate(m,
        (fieldNames, mutable.LinkedHashMap.empty))
      if (fieldNames != expected)
        throw new IllegalArgumentException(
          s"arc columnar: mismatched fields within batch for '$m' " +
            s"(${expected.mkString(",")} vs ${fieldNames.mkString(",")})")
      fieldNames.foreach { f =>
        cols.getOrElseUpdate(f, mutable.ArrayBuffer.empty) +=
          doc.get(f).toString
      }
    }
    val records = groups.map { case (m, (_, cols)) =>
      val colJson = cols.map { case (c, vs) =>
        s""""$c":[${vs.mkString(",")}]"""
      }.mkString(",")
      s"""{"m":"$m","columns":{$colJson}}"""
    }.mkString(",")
    s"""{"batch":[$records]}"""
  }

  private def rowJson(mapper: ObjectMapper,
                      rows: Seq[org.apache.spark.sql.Row]): String = {
    val records = rows.map { r =>
      s"""{"m":"${r.getString(0)}","fields":${r.getString(1)}}"""
    }.mkString(",")
    s"""{"batch":[$records]}"""
  }

  // ---- in-memory endpoint (mem://name) ----

  /** Decodes the msgpack body back through the engine's own decoder
    * and un-transposes columnar records into rows per measurement.
    */
  final class MemArc {
    private val mapper = new ObjectMapper()
    val tables: mutable.LinkedHashMap[(String, String),
      mutable.ArrayBuffer[String]] = mutable.LinkedHashMap.empty
    @volatile var lastToken: String = ""
    @volatile var lastDatabase: String = ""

    def handle(q: Http.Request): Http.Response = synchronized {
      lastToken = q.headers.getOrElse("Authorization", "")
        .stripPrefix("Bearer ")
      lastDatabase = q.headers.getOrElse("x-arc-database", "")
      var body = q.bodyBytes
      if (q.headers.get("Content-Encoding").contains("gzip")) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body))
        body = in.readAllBytes()
      }
      val json = CodecOps.msgpackDecode(body).toString
      val root = mapper.readTree(json)
      root.path("batch").forEach { rec =>
        val m = rec.path("m").asText
        val key = (lastDatabase, m)
        val buf = tables.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
        if (rec.has("columns")) {
          val cols = {
            val out = Seq.newBuilder[(String, Seq[String])]
            rec.path("columns").properties().forEach { e =>
              val vs = Seq.newBuilder[String]
              e.getValue.forEach(v => vs += v.toString)
              out += e.getKey -> vs.result()
            }
            out.result()
          }
          val lens = cols.map(_._2.size).distinct
          if (lens.size > 1)
            return Http.Response(400,
              """{"error":"mismatched column array lengths"}""")
          (0 until lens.headOption.getOrElse(0)).foreach { i =>
            buf += cols.map { case (c, vs) => s""""$c":${vs(i)}""" }
              .mkString("{", ",", "}")
          }
        } else buf += rec.path("fields").toString
      }
      Http.Response(204, "")
    }

    def rows(database: String, measurement: String): Seq[String] =
      synchronized {
        tables.getOrElse((database, measurement),
          mutable.ArrayBuffer.empty).toSeq
      }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemArc]()
  def named(name: String): MemArc =
    registry.computeIfAbsent(name, _ => new MemArc)
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(named(name).handle)

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
