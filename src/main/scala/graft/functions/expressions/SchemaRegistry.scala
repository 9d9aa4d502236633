package graft.functions.expressions

/** Pluggable id→schema resolution — the contract of the reference's
  * schema-registry client (internal/impl/confluent/: the 5-byte wire
  * header carries a schema id; the client resolves and caches id →
  * schema, and resolves subject → latest (id, schema) on the encode
  * side). Production backs this with the registry REST API; the
  * map-backed form is the offline/test provider. Serializable — a
  * provider ships inside the codec expressions to executors.
  */
trait SchemaProvider extends Serializable {
  /** Avro schema JSON for a registry id; None = unknown id. */
  def schemaFor(id: Int): Option[String]

  /** Latest (id, schema JSON) registered under a subject. */
  def latestFor(subject: String): Option[(Int, String)]
}

/** Map-backed provider (offline stub of the registry client — the
  * resolution semantics are real, only the lookup source is a map).
  */
final case class MapSchemaProvider(byId: Map[Int, String],
                                   bySubject: Map[String, Int] = Map.empty)
    extends SchemaProvider {
  override def schemaFor(id: Int): Option[String] = byId.get(id)
  override def latestFor(subject: String): Option[(Int, String)] =
    bySubject.get(subject).flatMap(id => byId.get(id).map(id -> _))
}

/** Registry-REST-backed provider — the reference client's HTTP contract
  * (internal/impl/confluent/sr/client.go; response shapes pinned by
  * processor_schema_registry_decode_test.go:250-263):
  *
  *   - `GET {base}/schemas/ids/{id}`                → `{"schema": "<avro json>"}`
  *   - `GET {base}/subjects/{subject}/versions/latest`
  *                                     → `{"id": N, "schema": "<avro json>"}`
  *
  * The subject is percent-encoded as a single path segment (the
  * reference escapes `main/common` → `main%2Fcommon`,
  * client_test.go:71). Transport is the pluggable
  * [[graft.operators.Http.Client]], so the full resolution path — URL
  * construction, JSON envelope parsing, error mapping, caching — runs
  * offline against [[HttpSchemaProvider.stubTransport]] and against a
  * real registry via the JDK client in production.
  *
  * Caching matches the reference client: a resolved id/subject is
  * fetched ONCE per JVM (its decode test counts server hits to pin
  * this); lookups that fail (404/network) are NOT cached, so a
  * late-registered schema resolves on the next attempt rather than
  * poisoning the executor for the job's lifetime. The caches are
  * `@transient` — each executor warms its own, which at 1000 executors
  * is 1000 fetches per schema id, the same fan-in the reference's
  * distributed consumers impose on a registry.
  */
final class HttpSchemaProvider(
    baseUrl: String,
    headers: Map[String, String] = Map.empty,
    client: graft.operators.Http.Client = null) extends SchemaProvider {

  @transient private lazy val idCache =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  @transient private lazy val subjectCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, String)]()

  private def transport: graft.operators.Http.Client =
    Option(client).getOrElse(graft.operators.Http.clientFor(baseUrl))

  private def get(path: String): Option[String] = {
    val url = baseUrl.stripSuffix("/") + path
    val r = transport(
      Seq(graft.operators.Http.Request(url, "GET", headers, ""))).head
    if (r.status >= 200 && r.status <= 299) Some(r.body) else None
  }

  override def schemaFor(id: Int): Option[String] =
    Option(idCache.get(id)).orElse {
      val fetched = for {
        body <- get(s"/schemas/ids/$id")
        node = HttpSchemaProvider.mapper.readTree(body)
        schema <- Option(node.get("schema")).map(_.asText)
      } yield schema
      fetched.foreach(idCache.putIfAbsent(id, _))
      fetched
    }

  override def latestFor(subject: String): Option[(Int, String)] =
    Option(subjectCache.get(subject)).orElse {
      val escaped = HttpSchemaProvider.pathEscape(subject)
      val fetched = for {
        body <- get(s"/subjects/$escaped/versions/latest")
        node = HttpSchemaProvider.mapper.readTree(body)
        id <- Option(node.get("id")).map(_.asInt)
        schema <- Option(node.get("schema")).map(_.asText)
      } yield (id, schema)
      fetched.foreach(subjectCache.putIfAbsent(subject, _))
      fetched
    }
}

object HttpSchemaProvider {

  private[expressions] lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Percent-encode a subject as ONE path segment — `/` must become
    * `%2F` (client_test.go:71: `main/common` → `main%2Fcommon`), which
    * rules out plain URL path joining.
    */
  def pathEscape(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20")

  /** Deterministic offline registry stand-in (an [[graft.operators.Http.Client]],
    * NOT a server) serving the two registry endpoints from maps, with
    * the registry's JSON envelopes — the schema travels as a JSON
    * string VALUE (escaped), so the provider's envelope parsing is
    * exercised for real. Unknown ids/subjects return the registry's
    * 404 error body (40403, decode_test.go's server).
    */
  def stubTransport(byId: Map[Int, String],
                    bySubject: Map[String, Int] = Map.empty)
      : graft.operators.Http.Client = {
    val IdPath = ".*/schemas/ids/(-?\\d+)".r
    val SubjPath = ".*/subjects/([^/]+)/versions/latest".r
    // one source of truth for the lookup rules — the stub serves
    // whatever the map provider resolves, so they cannot drift
    val source = MapSchemaProvider(byId, bySubject)
    reqs => reqs.map { q =>
      val path = q.url.replaceFirst("\\?.*$", "")
      path match {
        case IdPath(id) => source.schemaFor(id.toInt) match {
          case Some(schema) =>
            val env = mapper.createObjectNode()
            env.put("schema", schema)
            graft.operators.Http.Response(200, mapper.writeValueAsString(env))
          case None => graft.operators.Http.Response(404,
            """{"error_code":40403,"message":"Schema not found"}""")
        }
        case SubjPath(escaped) =>
          val subject = java.net.URLDecoder.decode(escaped,
            java.nio.charset.StandardCharsets.UTF_8)
          source.latestFor(subject) match {
            case Some((id, schema)) =>
              val env = mapper.createObjectNode()
              env.put("id", id)
              env.put("schema", schema)
              graft.operators.Http.Response(200, mapper.writeValueAsString(env))
            case None => graft.operators.Http.Response(404,
              """{"error_code":40401,"message":"Subject not found"}""")
          }
        case _ => graft.operators.Http.Response(404,
          """{"error_code":404,"message":"no such endpoint"}""")
      }
    }
  }
}
