package graft.sources

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** The `schema_registry` input/output (inputs/schema_registry.adoc,
  * outputs/schema_registry.adoc — the bulk sync pair; the per-message
  * wire-format encode/decode lives in
  * functions.expressions.SchemaRegistry): reads every subject-version
  * from a registry as one message each, and publishes schema messages
  * back under an interpolated subject.
  *
  * Input walk: `GET /subjects` → regex filter → per subject
  * `GET /subjects/{s}/versions` → per version
  * `GET /subjects/{s}/versions/{v}` (body = the version envelope JSON,
  * verbatim). Metadata: `schema_registry_subject`,
  * `schema_registry_version`, `schema_registry_subject_compatibility_
  * level` (subject config, falling back to the global config).
  * `fetch_in_order` sorts all messages by schema id — required when
  * schema references must be registered before their referents. A
  * registry is a METADATA service (subject counts, not data volume),
  * so the walk is a driver admission loop like the other SaaS inputs.
  *
  * Output: one `POST /subjects/{subject}/versions` per message with
  * the message's `schema`/`schemaType`/`references` fields — the shape
  * the input emits, so input → output is a registry sync pipeline.
  */
object SchemaRegistryIO {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  private val namedClients = TrieMap.empty[String, Http.Client]

  def registerClient(name: String, client: Http.Client): Unit =
    namedClients.update(name, client)

  def clientFor(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => namedClients.getOrElse(name, sys.error(
        s"schema_registry: no client registered for mem://$name"))(reqs)
    } else Http.javaClient()

  import graft.functions.expressions.HttpSchemaProvider.pathEscape

  def read(spark: SparkSession, url: String, subjectFilter: String = "",
           includeDeleted: Boolean = false, fetchInOrder: Boolean = true,
           client: Http.Client = null): DataFrame = {
    val c = Option(client).getOrElse(clientFor(url))
    val base = url.stripSuffix("/")
    def get(path: String): Option[String] = {
      val r = c(Seq(Http.Request(base + path, "GET", Map.empty, ""))).head
      if (r.status == 200) Some(r.body) else None
    }
    val del = if (includeDeleted) "?deleted=true" else ""
    val subjects = get("/subjects" + del)
      .map(b => mapper.readTree(b).elements().asScala.map(_.asText).toVector)
      .getOrElse(throw new IllegalStateException(
        s"schema_registry: cannot list subjects at $base"))
    val re = Option(subjectFilter).filter(_.nonEmpty).map(_.r)
    val selected = subjects.filter(s =>
      re.forall(_.findFirstIn(s).isDefined)).sorted
    val global = get("/config").map(compatOf).getOrElse("")
    val msgs = selected.flatMap { subj =>
      val esc = pathEscape(subj)
      val compat = get(s"/config/$esc").map(compatOf).getOrElse(global)
      val versions = get(s"/subjects/$esc/versions" + del)
        .map(b => mapper.readTree(b).elements().asScala
          .map(_.asInt).toVector.sorted).getOrElse(Vector.empty)
      versions.flatMap { v =>
        get(s"/subjects/$esc/versions/$v" + del).map { body =>
          val id = mapper.readTree(body).path("id").asInt(0)
          (id, subj, v, compat, body)
        }
      }
    }
    val ordered =
      if (fetchInOrder) msgs.sortBy(m => (m._1, m._2, m._3)) else msgs
    val rows = ordered.zipWithIndex.map { case ((_, subj, v, compat, body), i) =>
      Row(body, Map(
        "schema_registry_subject" -> subj,
        "schema_registry_version" -> v.toString) ++
        (if (compat.nonEmpty)
          Map("schema_registry_subject_compatibility_level" -> compat)
        else Map.empty),
        null, i.toLong)
    }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 256 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  private def compatOf(body: String): String =
    mapper.readTree(body).path("compatibilityLevel").asText("")

  /** One registration POST per message; the posted body keeps only the
    * schema fields (schema/schemaType/references), matching what a
    * registry accepts.
    */
  def write(df: DataFrame, url: String, subject: Column,
            client: Http.Client = null, batchSize: Int = 16): Unit = {
    val c = Option(client).getOrElse(clientFor(url))
    val base = url.stripSuffix("/")
    val subjEsc = url_encode(subject)
    val prepared = df
      .withColumn("__sr_url", concat(lit(base + "/subjects/"), subjEsc,
        lit("/versions")))
      .withColumn("__sr_body", to_json(struct(
        get_json_object(col(Envelope.ValueCol), "$.schema").as("schema"),
        get_json_object(col(Envelope.ValueCol), "$.schemaType")
          .as("schemaType"),
        // references must be posted as a REAL array — the registry API
        // marshals References as a list and rejects the escaped-string
        // form — so the extracted array text goes through parse_json
        // (variant); absent references stay null and are omitted
        parse_json(get_json_object(col(Envelope.ValueCol), "$.references"))
          .as("references"))))
    val sent = Http.requestBatched(prepared, "__sr_url", "__sr_body",
      "POST", Map("Content-Type" -> "application/vnd.schemaregistry.v1+json"),
      batchSize, c, "__resp", "__status")
    val bad = sent.filter(!col("__status").between(200, 299)).count()
    if (bad > 0) throw new IllegalStateException(
      s"schema_registry: $bad registrations rejected")
  }

  /** Subject as ONE percent-encoded path segment (the same rule as
    * HttpSchemaProvider.pathEscape, as a Column): url_encode is
    * form-encoding, so its `+` must become `%20`.
    */
  private def url_encode(c: Column): Column =
    regexp_replace(call_function("url_encode", c), lit("\\+"), lit("%20"))

  /** In-memory registry server: subjects/versions/config reads plus
    * version-registration POSTs (id assignment dedups identical schema
    * text per subject, like a real registry).
    */
  object InMemoryServer {
    /** `references` is the JSON array text of the version's schema
      * references ("" = none); the server validates that POSTs carry it
      * as a real array, never an escaped string.
      */
    final case class Entry(subject: String, version: Int, id: Int,
                           schema: String, deleted: Boolean = false,
                           references: String = "")

    final case class Transport(initial: Seq[Entry],
                               globalCompat: String = "BACKWARD",
                               subjectCompat: Map[String, String] = Map.empty)
        extends (Seq[Http.Request] => Seq[Http.Response])
        with Serializable {
      val entries = new java.util.concurrent.CopyOnWriteArrayList[Entry](
        initial.asJava)
      private val nextId = new java.util.concurrent.atomic.AtomicInteger(
        (initial.map(_.id) :+ 0).max + 1)

      private val Subjects = "/subjects".r
      private val Versions = "/subjects/([^/]+)/versions".r
      private val Version = "/subjects/([^/]+)/versions/(\\d+)".r
      private val SubjConfig = "/config/([^/]+)".r

      private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

      def apply(reqs: Seq[Http.Request]): Seq[Http.Response] = reqs.map { q =>
        val uri = java.net.URI.create(q.url)
        val path = uri.getPath
        val deleted = Option(uri.getRawQuery).exists(_.contains("deleted=true"))
        def live = entries.asScala.filter(e => deleted || !e.deleted)
        (q.verb, path) match {
          case ("GET", Subjects()) =>
            val subj = live.map(_.subject).distinct.sorted
            Http.Response(200,
              subj.map(s => s""""$s"""").mkString("[", ",", "]"))
          case ("GET", Version(s, v)) =>
            live.find(e => e.subject == dec(s) && e.version == v.toInt) match {
              case Some(e) =>
                val n = Shared.mapper.createObjectNode()
                n.put("subject", e.subject); n.put("version", e.version)
                n.put("id", e.id); n.put("schema", e.schema)
                if (e.references.nonEmpty)
                  n.set[com.fasterxml.jackson.databind.JsonNode]("references",
                    Shared.mapper.readTree(e.references))
                Http.Response(200, Shared.mapper.writeValueAsString(n))
              case None => Http.Response(404,
                """{"error_code":40402,"message":"Version not found"}""")
            }
          case ("GET", Versions(s)) =>
            val vs = live.filter(_.subject == dec(s)).map(_.version).sorted
            if (vs.isEmpty) Http.Response(404,
              """{"error_code":40401,"message":"Subject not found"}""")
            else Http.Response(200, vs.mkString("[", ",", "]"))
          case ("POST", Versions(s)) =>
            val subj = dec(s)
            val body = Shared.mapper.readTree(q.body)
            val schema = body.path("schema").asText("")
            val refs = body.get("references")
            if (schema.isEmpty)
              Http.Response(422,
                """{"error_code":42201,"message":"Empty schema"}""")
            else if (refs != null && !refs.isNull && !refs.isArray)
              // a Confluent-compatible registry unmarshals references
              // into a list — the escaped-string form is a 422
              Http.Response(422,
                """{"error_code":42201,"message":""" +
                  """"references must be a list"}""")
            else entries.asScala
              .find(e => e.subject == subj && e.schema == schema) match {
              case Some(e) =>
                Http.Response(200, s"""{"id":${e.id}}""")
              case None =>
                val id = nextId.getAndIncrement()
                val v = entries.asScala.filter(_.subject == subj)
                  .map(_.version).maxOption.getOrElse(0) + 1
                entries.add(Entry(subj, v, id, schema,
                  references =
                    if (refs == null || refs.isNull) "" else refs.toString))
                Http.Response(200, s"""{"id":$id}""")
            }
          case ("GET", SubjConfig(s)) =>
            subjectCompat.get(dec(s)) match {
              case Some(l) =>
                Http.Response(200, s"""{"compatibilityLevel":"$l"}""")
              case None => Http.Response(404,
                """{"error_code":40408,"message":"No subject config"}""")
            }
          case ("GET", "/config") =>
            Http.Response(200,
              s"""{"compatibilityLevel":"$globalCompat"}""")
          case (_, other) =>
            Http.Response(404,
              s"""{"error_code":404,"message":"no route $other"}""")
        }
      }
    }
  }
}
