package graft.sources

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Subject-space pub/sub transport seam for the NATS and MQTT
  * connector families (inputs/nats.adoc, inputs/nats_jetstream.adoc,
  * inputs/mqtt.adoc) — the third and fourth applications of the
  * injectable-transport template (Broker = kafka, Mq = amqp).
  *
  * Unlike AMQP there are no exchanges: producers publish to a SUBJECT
  * and consumers filter with a wildcard pattern. The two families
  * differ only in their subject grammar (public wildcard semantics):
  *
  *   - NATS: '.'-separated tokens; `*` matches exactly one token;
  *     `>` (only valid as the final token) matches one or more
  *     trailing tokens.
  *   - MQTT: '/'-separated levels; `+` matches exactly one level;
  *     `#` (only valid as the final level) matches zero or more.
  *
  * The in-memory fake is a REPLAYABLE sequenced log of everything
  * published — i.e. JetStream/persistent-session semantics, which is
  * what a bounded Spark read needs (core NATS fire-and-forget has
  * nothing to read after the fact). Sequence numbers are global and
  * gapless, so reads are deterministic.
  */
object PubSub {

  final case class Published(seq: Long, subject: String, body: Array[Byte],
                             headers: Map[String, String])

  /** `style` is "nats" or "mqtt" — selects the wildcard grammar. */
  def matches(style: String, pattern: String, subject: String): Boolean = {
    val (sep, one, tail, tailMin) = style match {
      case "nats" => ('.', "*", ">", 1) // '>' needs >= 1 token
      case "mqtt" => ('/', "+", "#", 0) // '#' matches zero or more
      case other => throw new IllegalArgumentException(s"style: $other")
    }
    val ps = pattern.split(java.util.regex.Pattern.quote(sep.toString), -1)
    val ks = subject.split(java.util.regex.Pattern.quote(sep.toString), -1)
    def go(i: Int, j: Int): Boolean =
      if (i == ps.length) j == ks.length
      else if (ps(i) == tail && i == ps.length - 1) ks.length - j >= tailMin
      else if (j == ks.length) false
      else if (ps(i) == one || ps(i) == ks(j)) go(i + 1, j + 1)
      else false
    go(0, 0)
  }

  /** Replayable subject log (JVM-wide named registry, same visibility
    * contract as the other in-memory transports; a documented test
    * transport, NOT a server).
    */
  final class InMemory {
    private val log = ArrayBuffer.empty[Published]

    def publish(subject: String, body: Array[Byte],
                headers: Map[String, String] = Map.empty): Long =
      log.synchronized {
        val seq = log.length.toLong + 1 // 1-based like NATS stream seq
        log += Published(seq, subject, body, headers)
        seq
      }

    def size: Long = log.synchronized(log.length.toLong)

    /** All messages matching `pattern` under `style`, in publish
      * order, over the sequence range [fromSeq, untilSeq].
      */
    def read(style: String, pattern: String, fromSeq: Long = 1L,
             untilSeq: Long = Long.MaxValue): Vector[Published] =
      log.synchronized(log.toVector)
        .filter(p => p.seq >= fromSeq && p.seq <= untilSeq &&
          matches(style, pattern, p.subject))
  }

  object InMemory {
    private val registry = TrieMap.empty[String, InMemory]
    def named(name: String): InMemory =
      registry.getOrElseUpdate(name, new InMemory)
    def drop(name: String): Unit = { registry.remove(name); () }
  }

  def transportFor(address: String): InMemory =
    if (address.startsWith("mem://")) InMemory.named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no pub/sub transport for '$address' in this environment " +
        "(mem:// is the in-process fake; real brokers need a client)")

  /** Bounded subject read → the message envelope. The snapshot bound
    * is taken up front (like the broker read's end offsets), and the
    * scan parallelizes by slicing the sequence range — matching is
    * executor-side, only the (address, pattern, range) strings travel.
    */
  def read(spark: SparkSession, style: String, address: String,
           pattern: String): DataFrame = {
    val until = transportFor(address).size
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (until / 1024L).toInt + 1))
    val bounds = (0 until slices).map { i =>
      val span = until / slices + 1
      (i * span + 1L, math.min((i + 1L) * span, until))
    }
    val (subjKey, seqKey) =
      if (style == "mqtt") ("mqtt_topic", "mqtt_message_id")
      else ("nats_subject", "nats_sequence")
    val rows = spark.sparkContext.parallelize(bounds, slices)
      .flatMap { case (from, to) =>
        PubSub.transportFor(address).read(style, pattern, from, to).map { p =>
          val meta = Map(
            subjKey -> p.subject,
            seqKey -> p.seq.toString) ++ p.headers
          Row(new String(p.body, "UTF-8"), meta, null, p.seq)
        }
      }
    spark.createDataFrame(rows, BrokerStream.schema)
  }

  /** Publish every row to its per-row subject — a narrow executor-side
    * pass, no shuffle (the shared log serializes appends, the same
    * bottleneck a single NATS stream replica has).
    */
  def write(df: DataFrame, address: String, subjectCol: String,
            valueCol: String = "value"): Unit = {
    val sIdx = df.schema.fieldIndex(subjectCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = PubSub.transportFor(address)
      it.foreach { r =>
        val subj = if (r.isNullAt(sIdx)) "" else r.getString(sIdx)
        val body = if (r.isNullAt(vIdx)) Array.empty[Byte]
          else r.getString(vIdx).getBytes("UTF-8")
        t.publish(subj, body)
      }
    }
  }
}
