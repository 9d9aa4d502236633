package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

import graft.operators.Http

/** `redpanda_migrator` input/output pair (reference
  * internal/impl/redpanda/migrator, 8,900 LoC over franz-go/kadm —
  * contract only): cluster-to-cluster migration coordinating THREE
  * migrators (migrator.go):
  *
  *  - topics (migrator_topic.go): destination topics created with the
  *    source's partition count; ACLs synced
  *  - schema registry (migrator_schema_registry.go): every subject's
  *    versions re-registered IN VERSION ORDER on the destination;
  *    because the destination assigns its own ids, data records whose
  *    key/value carry the Confluent wire envelope (magic byte 0x00 +
  *    big-endian schema id) are REWRITTEN to the destination id
  *    during the copy — `DestinationSchemaID`
  *  - consumer groups (migrator_groups.go): committed offsets
  *    translated to destination coordinates; the copy preserves
  *    per-partition record order 1:1, so translation is the exact-
  *    offset mapping (`tryFindExactOffset`) — destination base offset
  *    + (source offset − source base)
  *
  * Scale shape: the data copy fans out one Spark task per
  * (topic, partition) — each task streams chunked fetches from the
  * source transport into ordered appends on the destination, no
  * driver funnel (this is the reference's 1 M msg/s workload; the
  * per-partition pipe is the unit of parallelism there too). Schema
  * and group sync are tiny bounded admin sweeps.
  */
object Migrator {

  final case class Report(topics: Int, records: Long, schemas: Int,
                          groups: Int, acls: Int)

  /** Translate one Confluent-framed payload to destination ids. */
  def translateSchemaId(bytes: Array[Byte], idMap: Map[Int, Int]): Array[Byte] =
    if (bytes == null || bytes.length < 5 || bytes(0) != 0) bytes
    else {
      val srcId = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
      idMap.get(srcId) match {
        case None => bytes
        case Some(dstId) =>
          val out = bytes.clone()
          java.nio.ByteBuffer.wrap(out, 1, 4).putInt(dstId)
          out
      }
    }

  /** Re-register every live source subject version on the destination
    * (version order preserved); returns srcId → dstId.
    */
  def syncSchemas(src: Http.Client, dst: Http.Client,
                  srcBase: String = "http://src-registry",
                  dstBase: String = "http://dst-registry"): Map[Int, Int] = {
    val m = new ObjectMapper()
    def get(c: Http.Client, base: String, path: String): Option[String] = {
      val r = c(Seq(Http.Request(s"$base$path", "GET", Map.empty, ""))).head
      if (r.status == 200) Some(r.body) else None
    }
    val subjects = get(src, srcBase, "/subjects").toSeq
      .flatMap(b => m.readTree(b).elements().asScala.map(_.asText))
    val idMap = Map.newBuilder[Int, Int]
    subjects.foreach { subj =>
      val enc = graft.functions.expressions.HttpSchemaProvider.pathEscape(subj)
      val versions = get(src, srcBase, s"/subjects/$enc/versions").toSeq
        .flatMap(b => m.readTree(b).elements().asScala.map(_.asInt)).sorted
      versions.foreach { v =>
        val entry = get(src, srcBase, s"/subjects/$enc/versions/$v")
          .map(m.readTree).getOrElse(
            throw new IllegalStateException(s"migrator: $subj v$v missing"))
        val body = m.createObjectNode()
        body.put("schema", entry.get("schema").asText)
        Option(entry.get("references")).foreach { r =>
          body.set[com.fasterxml.jackson.databind.JsonNode]("references", r)
          ()
        }
        val resp = dst(Seq(Http.Request(
          s"$dstBase/subjects/$enc/versions", "POST",
          Map("Content-Type" -> "application/vnd.schemaregistry.v1+json"),
          body.toString))).head
        if (resp.status != 200)
          throw new IllegalStateException(
            s"migrator: register $subj v$v -> ${resp.status} ${resp.body}")
        idMap += entry.get("id").asInt -> m.readTree(resp.body).get("id").asInt
      }
    }
    idMap.result()
  }

  /** Full migration sweep. `topics` empty = every source topic. */
  def migrate(spark: SparkSession, srcAddr: String, dstAddr: String,
              topics: Seq[String] = Nil,
              srcRegistry: Http.Client = null,
              dstRegistry: Http.Client = null,
              syncGroups: Boolean = true, syncAcls: Boolean = true,
              chunk: Int = 2048): Report = {
    val src = Broker.transportFor(srcAddr)
    val dst = Broker.transportFor(dstAddr)

    // 1. schema registry sync → id translation map
    val idMap: Map[Int, Int] =
      if (srcRegistry == null || dstRegistry == null) Map.empty
      else syncSchemas(srcRegistry, dstRegistry)

    // 2. topics: create destination with the source partition count
    val topicList = (if (topics.nonEmpty) topics else src.listTopics()).sorted
    val partedTopics = topicList.map(t => t -> src.partitionCount(t))
    partedTopics.foreach { case (t, n) => dst.createTopic(t, n) }

    // ACLs (bounded admin state)
    val aclCount =
      if (!syncAcls) 0
      else {
        val relevant = src.listAcls().filter { case (_, _, topic) =>
          topic == "*" || topicList.contains(topic)
        }
        relevant.foreach { case (p, o, t) => dst.createAcl(p, o, t) }
        relevant.size
      }

    // 3. data copy: one task per (topic, partition); each task records
    // the destination BASE offset for the group translation below
    val pairs = partedTopics.flatMap { case (t, n) => (0 until n).map((t, _)) }
    val (sA, dA, ch, im) = (srcAddr, dstAddr, chunk, idMap)
    val copied: Seq[(String, Int, Long, Long)] =
      if (pairs.isEmpty) Nil
      else spark.sparkContext
        .parallelize(pairs, math.max(1, math.min(pairs.size,
          spark.sparkContext.defaultParallelism)))
        .map { case (topic, p) =>
          val s = Broker.transportFor(sA)
          val d = Broker.transportFor(dA)
          val end = s.endOffset(topic, p)
          val dstBase = d.endOffset(topic, p)
          var from = 0L
          var n = 0L
          (s, d) match {
            case (sr: Broker.RawBatchTransport, dr: Broker.RawBatchTransport)
                if im.isEmpty =>
              // batch passthrough: no schema-id rewriting needed, so
              // wire record-sets copy verbatim (source batches start at
              // offset 0 and `from` advances by whole batches, keeping
              // every fetch boundary-aligned → the broker serves raw
              // bytes; the destination re-bases by header patch)
              while (from < end) {
                val (bytes, cnt, hw) = sr.fetchRawBatches(topic, p, from)
                if (cnt == 0) {
                  if (bytes.nonEmpty)
                    // bytes with zero decodable records: `from` can
                    // never advance — fail loudly instead of spinning
                    throw new IllegalStateException(
                      s"raw fetch returned ${bytes.length} bytes but 0 " +
                        s"records at $topic/$p@$from")
                  // nothing served (e.g. from == end race): re-check end
                  from = math.max(from, math.min(end, hw))
                  if (from < end)
                    throw new IllegalStateException(
                      s"raw fetch stalled at $topic/$p@$from")
                } else if (from + cnt > end) {
                  // the served batch spills past the end-offset snapshot
                  // (live topic, records produced after `end` was read):
                  // batches are indivisible on the raw path, so copy the
                  // remaining [from, end) slice through the bounded
                  // record path — the migration stays an exact snapshot
                  val records = s.fetch(topic, p, from, end).map { st =>
                    Broker.Record(st.key, st.value, st.headers,
                      st.timestampMs)
                  }.toSeq
                  d.append(topic, p, records)
                  n += records.size
                  from = end
                } else {
                  dr.appendRawBatches(topic, p, bytes)
                  n += cnt
                  from += cnt
                }
              }
            case _ =>
              while (from < end) {
                val until = math.min(from + ch, end)
                val records = s.fetch(topic, p, from, until).map { st =>
                  Broker.Record(
                    translateSchemaId(st.key, im),
                    translateSchemaId(st.value, im),
                    st.headers, st.timestampMs)
                }.toSeq
                d.append(topic, p, records)
                n += records.size
                from = until
              }
          }
          (topic, p, dstBase, n)
        }.collect().toSeq
    val records = copied.map(_._4).sum
    val dstBases = copied.map(c => (c._1, c._2) -> c._3).toMap

    // 4. consumer groups: exact-offset translation (order-preserving
    // copy ⇒ dstOffset = dstBase + srcOffset; source logs start at 0)
    val groupCount =
      if (!syncGroups) 0
      else {
        val groups = src.listGroups()
        groups.foreach { g =>
          src.committedOffsets(g).foreach { case (t, p, off) =>
            if (topicList.contains(t))
              dst.commitGroupOffset(g, t, p,
                dstBases.getOrElse((t, p), 0L) + off)
          }
        }
        groups.count(g => src.committedOffsets(g)
          .exists(c => topicList.contains(c._1)))
      }

    Report(topicList.size, records, idMap.size, groupCount, aclCount)
  }
}
