package graft.sources

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Kafka-shaped broker transport seam.
  *
  * The reference's #1 connector family is kafka/redpanda
  * (internal/impl/kafka/input_redpanda.go:103,
  * output_redpanda.go:87); its semantics that matter to a DATA
  * engine — and that this seam makes testable without a broker or a
  * connector jar — are:
  *
  *   - topics are arrays of independent, append-only PARTITIONS;
  *   - each record lands in exactly one partition at a monotonically
  *     increasing offset, and consumption within a partition is
  *     offset-ordered (franz_reader_ordered.go — the reference's
  *     strict-ordering reader);
  *   - the producer picks the partition from the record KEY (default
  *     `fnv1a_hash`, output_sarama_kafka.go:367) or an explicit
  *     `partition` when `partitioner: manual`;
  *   - consumers surface `kafka_key/kafka_topic/kafka_partition/
  *     kafka_offset/kafka_timestamp_ms/kafka_timestamp_unix/
  *     kafka_lag/kafka_tombstone_message` plus record headers as
  *     metadata (inputs/kafka.adoc Metadata section).
  *
  * [[Broker.Transport]] is the injectable seam (the same pattern as
  * [[graft.operators.Http.Client]]): `mem://<name>` addresses resolve
  * to the in-process [[Broker.InMemory]] fake so ordering/metadata/
  * partitioning contracts run in CI; on a real cluster the seam is
  * where the kafka client (or Spark's own kafka source, see
  * [[Sources.kafka]]) plugs in — the DataFrame shape on either side is
  * identical.
  */
object Broker {

  /** A record as produced (broker assigns partition's offset). */
  final case class Record(key: Array[Byte], value: Array[Byte],
                          headers: Map[String, String] = Map.empty,
                          timestampMs: Long = 0L)

  /** A record as stored/fetched (offset assigned). A null value is a
    * tombstone (inputs/kafka.adoc `kafka_tombstone_message`).
    */
  final case class Stored(partition: Int, offset: Long, key: Array[Byte],
                          value: Array[Byte], headers: Map[String, String],
                          timestampMs: Long)

  /** Minimal broker contract: enough surface for an ordered reader and
    * a partitioned writer, nothing client-library-specific.
    */
  trait Transport {
    def createTopic(topic: String, partitions: Int): Unit
    def partitionCount(topic: String): Int
    /** High-water mark per partition (next offset to be assigned). */
    def endOffset(topic: String, partition: Int): Long
    /** Offset-ordered scan of one partition over [from, until). */
    def fetch(topic: String, partition: Int, from: Long, until: Long): Iterator[Stored]
    /** Atomically append a pre-ordered chunk to ONE partition;
      * returns the first assigned offset.
      */
    def append(topic: String, partition: Int, records: Seq[Record]): Long

    /** Run `body` (this thread's appends) inside a transaction where
      * the transport supports one — the kafka output's
      * `transactional_id` (KIP-98 EOS). The default is a passthrough:
      * in-memory transports are exactly-once by construction, so the
      * option is a no-op there. [[graft.sources.KafkaWire.Client]]
      * overrides this with a real InitProducerId → AddPartitionsToTxn →
      * produce → EndTxn session, aborting when `body` throws.
      */
    def transactional[T](topic: String, partition: Int)(body: => T): T = body

    // ── admin surface the migrator family needs (kadm-shaped);
    //    defaults so minimal transports stay valid ──
    def listTopics(): Seq[String] =
      throw new UnsupportedOperationException("listTopics")
    def commitGroupOffset(group: String, topic: String, partition: Int,
                          offset: Long): Unit =
      throw new UnsupportedOperationException("commitGroupOffset")
    def committedOffsets(group: String): Seq[(String, Int, Long)] = Nil
    def listGroups(): Seq[String] = Nil
    def createAcl(principal: String, operation: String,
                  topic: String): Unit =
      throw new UnsupportedOperationException("createAcl")
    def listAcls(): Seq[(String, String, String)] = Nil
  }

  /** Optional batch-passthrough surface (KafkaWire): wire record-sets
    * move verbatim — the broker re-bases offsets by patching batch
    * headers (outside the CRC region), so a copy never decodes record
    * bodies. This is what makes broker→broker migration memcpy-bound,
    * the same property real brokers exploit for zero-copy replication.
    */
  trait RawBatchTransport { self: Transport =>
    /** One fetch round at `from`: (rawRecordSet, recordCount, highWatermark). */
    def fetchRawBatches(topic: String, partition: Int,
                        from: Long): (Array[Byte], Int, Long)
    /** Produce a wire record-set verbatim; returns the assigned base offset. */
    def appendRawBatches(topic: String, partition: Int,
                         recordSet: Array[Byte]): Long
  }

  /** In-process broker fake: a named registry of topics, each an array
    * of synchronized append-only partition logs. JVM-wide on purpose —
    * under `local[&#42;]` every executor thread sees the same instance,
    * which is exactly the visibility a broker provides to a cluster.
    * This is a documented test transport, NOT a server.
    */
  final class InMemory extends Transport {
    private val topics = TrieMap.empty[String, Array[ArrayBuffer[Stored]]]
    /** group → (topic, partition) → committed offset. */
    private val groups =
      TrieMap.empty[String, TrieMap[(String, Int), Long]]
    private val acls = ArrayBuffer.empty[(String, String, String)]

    override def listTopics(): Seq[String] = topics.keys.toSeq.sorted

    override def commitGroupOffset(group: String, topic: String,
                                   partition: Int, offset: Long): Unit = {
      groups.getOrElseUpdate(group, TrieMap.empty)
        .update((topic, partition), offset)
    }

    override def committedOffsets(group: String): Seq[(String, Int, Long)] =
      groups.get(group).map(_.toSeq.map { case ((t, p), o) => (t, p, o) })
        .getOrElse(Nil).sortBy(x => (x._1, x._2))

    override def listGroups(): Seq[String] = groups.keys.toSeq.sorted

    override def createAcl(principal: String, operation: String,
                           topic: String): Unit = acls.synchronized {
      val entry = (principal, operation, topic)
      if (!acls.contains(entry)) acls += entry
      ()
    }

    override def listAcls(): Seq[(String, String, String)] =
      acls.synchronized(acls.toVector)

    def createTopic(topic: String, partitions: Int): Unit = {
      require(partitions > 0, s"topic $topic needs >= 1 partition")
      topics.putIfAbsent(topic, Array.fill(partitions)(ArrayBuffer.empty[Stored]))
      ()
    }

    private def log(topic: String, partition: Int): ArrayBuffer[Stored] = {
      val parts = topics.getOrElse(topic,
        throw new IllegalArgumentException(s"unknown topic: $topic"))
      require(partition >= 0 && partition < parts.length,
        s"$topic has ${parts.length} partitions; got $partition")
      parts(partition)
    }

    def partitionCount(topic: String): Int =
      topics.getOrElse(topic,
        throw new IllegalArgumentException(s"unknown topic: $topic")).length

    def endOffset(topic: String, partition: Int): Long = {
      val l = log(topic, partition)
      l.synchronized(l.length.toLong)
    }

    def fetch(topic: String, partition: Int, from: Long, until: Long): Iterator[Stored] = {
      val l = log(topic, partition)
      // snapshot under the log's lock: offset i is ALWAYS index i
      l.synchronized(l.slice(from.toInt, math.min(until, l.length).toInt).toVector)
        .iterator
    }

    def append(topic: String, partition: Int, records: Seq[Record]): Long = {
      val l = log(topic, partition)
      l.synchronized {
        val first = l.length.toLong
        records.foreach { r =>
          l += Stored(partition, l.length.toLong, r.key, r.value,
            r.headers, r.timestampMs)
        }
        first
      }
    }
  }

  object InMemory {
    private val registry = TrieMap.empty[String, InMemory]
    /** Named lookup so executor closures carry only the NAME. */
    def named(name: String): InMemory =
      registry.getOrElseUpdate(name, new InMemory)
    def drop(name: String): Unit = { registry.remove(name); () }
  }

  /** Resolve an address to a transport. `mem://<name>` is the
    * in-process fake; anything else needs a real client at this seam
    * (on Spark clusters, prefer [[Sources.kafka]] — the native
    * connector — over adapting one through this interface).
    */
  def transportFor(address: String): Transport =
    if (address.startsWith("mem://")) InMemory.named(address.stripPrefix("mem://"))
    else if (address.startsWith("kafka://"))
      // the hand-rolled Kafka binary protocol client over real TCP
      // (KafkaWire.scala) — the same Transport contract, real frames
      KafkaWire.clientFor(address.stripPrefix("kafka://"))
    else throw new IllegalArgumentException(
      s"no broker transport for '$address' in this environment " +
        "(mem:// is the in-process fake, kafka://host:port the wire " +
        "client; real clusters can also use the native " +
        "spark-sql-kafka connector)")

  // ── partitioners (output_sarama_kafka.go:367 vocabulary) ────────────

  /** FNV-1a 32-bit over the key bytes — the reference's default
    * `fnv1a_hash` partitioner.
    */
  def fnv1a(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5 // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xff
      h *= 0x01000193 // FNV prime
      i += 1
    }
    h
  }

  /** Murmur2 over the key bytes (the `murmur2_hash` option — the Java
    * client's default partitioner; public algorithm).
    */
  def murmur2(bytes: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ bytes.length
    val n4 = bytes.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (bytes(i4) & 0xff) | ((bytes(i4 + 1) & 0xff) << 8) |
        ((bytes(i4 + 2) & 0xff) << 16) | ((bytes(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val tail = n4 * 4
    (bytes.length & 3) match {
      case 3 =>
        h ^= (bytes(tail + 2) & 0xff) << 16
        h ^= (bytes(tail + 1) & 0xff) << 8
        h ^= bytes(tail) & 0xff
        h *= m
      case 2 =>
        h ^= (bytes(tail + 1) & 0xff) << 8
        h ^= bytes(tail) & 0xff
        h *= m
      case 1 =>
        h ^= bytes(tail) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** Key → partition under a named partitioner. Hash partitioners use
    * a non-negative modulus so every signed hash maps into [0, n).
    */
  def partitionFor(partitioner: String, key: Array[Byte], n: Int): Int =
    partitioner match {
      case "fnv1a_hash" => ((fnv1a(key) % n) + n) % n
      case "murmur2_hash" =>
        // kafka's java partitioner masks the sign bit (toPositive)
        (murmur2(key) & 0x7fffffff) % n
      case "java_hash" =>
        // pulsar's default key router (JavaStringHash: UTF-8 string
        // hashCode, sign-masked)
        (new String(key, "UTF-8").hashCode & 0x7fffffff) % n
      case other => throw new IllegalArgumentException(
        s"partitioner: $other (manual partitions are passed explicitly)")
    }
}
