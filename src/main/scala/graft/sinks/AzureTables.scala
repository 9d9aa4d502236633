package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Http
import graft.sources.AzureBlob
import graft.sources.AzureBlob.Account

/** `azure_table_storage` output (reference doc
  * outputs/azure_table_storage.adoc; impl rides the Azure SDK —
  * contract only): entities written by interpolated
  * partition_key/row_key with an `insert_type` of INSERT /
  * INSERT_MERGE / INSERT_REPLACE, over the PUBLIC Table service REST
  * surface — `POST /{table}` (InsertEntity, 409 on conflict),
  * `PUT/MERGE /{table}(PartitionKey='p',RowKey='r')` — authorized
  * with the TABLE-service Shared Key (VERB, Content-MD5,
  * Content-Type, Date, canonicalized resource — a DIFFERENT
  * string-to-sign than the Blob service's; the loopback re-derives
  * it).
  *
  * Scale shape: one connection per partition, one entity op per row
  * (the service's own granularity), no shuffle.
  */
object AzureTables {

  private def mapper = new ObjectMapper()

  /** Table-service Shared Key (4-line string-to-sign + resource). */
  object TableSharedKey {
    def stringToSign(account: String, verb: String, contentMd5: String,
                     contentType: String, date: String,
                     resourcePath: String): String =
      Seq(verb, contentMd5, contentType, date).mkString("\n") +
        "\n" + s"/$account$resourcePath"

    def authorization(acct: Account, verb: String, contentMd5: String,
                      contentType: String, date: String,
                      resourcePath: String): String =
      s"SharedKey ${acct.name}:" + AzureBlob.SharedKey.hmacBase64(
        acct.base64Key,
        stringToSign(acct.name, verb, contentMd5, contentType, date,
          resourcePath))
  }

  private def msDate(): String =
    java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  final class Client(endpoint: String, acct: Account,
                     client: Http.Client = null) extends Serializable {
    @transient private lazy val c =
      Option(client).getOrElse(resolveClient(endpoint))
    private val base = endpoint.stripSuffix("/")

    private def request(verb: String, path: String,
                        body: String): Http.Response = {
      val date = msDate()
      val ct = if (body.isEmpty) "" else "application/json"
      val auth = TableSharedKey.authorization(acct, verb, "", ct, date, path)
      val headers = Map(
        "Date" -> date,
        "x-ms-version" -> "2019-02-02",
        "Accept" -> "application/json;odata=nometadata",
        "Authorization" -> auth) ++
        (if (ct.isEmpty) Map.empty else Map("Content-Type" -> ct))
      c(Seq(Http.Request(s"$base$path", verb, headers, body))).head
    }

    private def entityPath(table: String, pk: String, rk: String): String = {
      def esc(s: String) = s.replace("'", "''")
      s"/$table(PartitionKey='${esc(pk)}',RowKey='${esc(rk)}')"
    }

    /** INSERT: fails with 409 when the entity exists. */
    def insert(table: String, entityJson: String): Unit = {
      val r = request("POST", s"/$table", entityJson)
      if (r.status == 409) throw new IllegalStateException(
        "azure_table: EntityAlreadyExists")
      if (r.status / 100 != 2) throw new IllegalStateException(
        s"azure_table insert: ${r.status} ${r.body.take(200)}")
    }

    def insertOrReplace(table: String, pk: String, rk: String,
                        entityJson: String): Unit = {
      val r = request("PUT", entityPath(table, pk, rk), entityJson)
      if (r.status / 100 != 2) throw new IllegalStateException(
        s"azure_table replace: ${r.status} ${r.body.take(200)}")
    }

    def insertOrMerge(table: String, pk: String, rk: String,
                      entityJson: String): Unit = {
      val r = request("MERGE", entityPath(table, pk, rk), entityJson)
      if (r.status / 100 != 2) throw new IllegalStateException(
        s"azure_table merge: ${r.status} ${r.body.take(200)}")
    }

    /** Query Entities (nometadata): the `value` array. */
    def query(table: String): Seq[String] = {
      val r = request("GET", s"/$table()", "")
      if (r.status != 200) throw new IllegalStateException(
        s"azure_table query: ${r.status} ${r.body.take(200)}")
      mapper.readTree(r.body).path("value").elements().asScala
        .map(_.toString).toVector
    }
  }

  /** Write one entity per row. `propsCol` is the entity's property
    * object (JSON); PartitionKey/RowKey come from their own columns
    * (the interpolated config fields).
    */
  def write(df: DataFrame, endpoint: String, acct: Account, table: String,
            partitionKeyCol: Column, rowKeyCol: Column,
            propsCol: Column = col("value"),
            insertType: String = "INSERT",
            client: Http.Client = null): Unit = {
    require(Set("INSERT", "INSERT_MERGE", "INSERT_REPLACE")(insertType),
      s"insert_type $insertType")
    val prepared = df.select(partitionKeyCol.cast("string").as("pk"),
      rowKeyCol.cast("string").as("rk"), propsCol.cast("string").as("v"))
    val (e, a, t, it0) = (endpoint, acct, table, insertType)
    val clientV = client
    prepared.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val cl = new Client(e, a, clientV)
        val m = new ObjectMapper()
        rows.foreach { r =>
          val entity = m.readTree(r.getString(2))
            .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          entity.put("PartitionKey", r.getString(0))
          entity.put("RowKey", r.getString(1))
          it0 match {
            case "INSERT" => cl.insert(t, entity.toString)
            case "INSERT_REPLACE" =>
              cl.insertOrReplace(t, r.getString(0), r.getString(1),
                entity.toString)
            case "INSERT_MERGE" =>
              cl.insertOrMerge(t, r.getString(0), r.getString(1),
                entity.toString)
          }
        }
      }
    }
  }

  /** Loopback Table service with full Shared Key re-derivation. */
  final class MemTables(acct: Account) {
    private val m = new ObjectMapper()
    // table → (pk, rk) → entity
    val tables: mutable.LinkedHashMap[String,
      mutable.LinkedHashMap[(String, String), JsonNode]] =
      mutable.LinkedHashMap.empty
    @volatile var rejected = 0

    private val EntityRe =
      """/([^(]+)\(PartitionKey='(.*)',RowKey='(.*)'\)""".r

    def handle(q: Http.Request): Http.Response = synchronized {
      val path = q.url.stripPrefix("mem://").dropWhile(_ != '/')
      val date = q.headers.getOrElse("Date", "")
      val ct = q.headers.getOrElse("Content-Type", "")
      val expected = TableSharedKey.authorization(acct, q.verb, "", ct,
        date, path)
      if (!q.headers.get("Authorization").contains(expected)) {
        rejected += 1
        return Http.Response(403,
          """{"odata.error":{"code":"AuthenticationFailed"}}""")
      }
      path match {
        case EntityRe(table, pk0, rk0) =>
          val (pk, rk) = (pk0.replace("''", "'"), rk0.replace("''", "'"))
          val tbl = tables.getOrElseUpdate(table, mutable.LinkedHashMap.empty)
          q.verb match {
            case "PUT" =>
              tbl((pk, rk)) = m.readTree(q.body)
              Http.Response(204, "")
            case "MERGE" =>
              val merged = tbl.get((pk, rk)) match {
                case Some(old) =>
                  val o = old.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
                  m.readTree(q.body).properties().asScala
                    .foreach(e => o.set[JsonNode](e.getKey, e.getValue))
                  o
                case None => m.readTree(q.body)
              }
              tbl((pk, rk)) = merged
              Http.Response(204, "")
            case "DELETE" =>
              tbl.remove((pk, rk))
              Http.Response(204, "")
            case other => Http.Response(405, s"verb $other")
          }
        case p if q.verb == "POST" =>
          val table = p.stripPrefix("/")
          val e = m.readTree(q.body)
          val key = (e.path("PartitionKey").asText, e.path("RowKey").asText)
          val tbl = tables.getOrElseUpdate(table, mutable.LinkedHashMap.empty)
          if (tbl.contains(key))
            Http.Response(409,
              """{"odata.error":{"code":"EntityAlreadyExists"}}""")
          else { tbl(key) = e; Http.Response(201, e.toString) }
        case p if q.verb == "GET" && p.endsWith("()") =>
          val table = p.stripPrefix("/").stripSuffix("()")
          val o = m.createObjectNode()
          val arr = o.putArray("value")
          tables.getOrElse(table, mutable.LinkedHashMap.empty)
            .values.foreach(e => { arr.add(e); () })
          Http.Response(200, o.toString)
        case other => Http.Response(404, s"no route: $other")
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemTables]()

  def register(name: String, acct: Account): MemTables =
    registry.computeIfAbsent(name, _ => new MemTables(acct))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handle(r))
          .getOrElse(Http.Response(404, "no such table service"))
      }
    } else Http.javaClient()
}
