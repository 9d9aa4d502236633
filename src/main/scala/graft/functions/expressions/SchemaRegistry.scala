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
