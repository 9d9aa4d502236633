package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** AWS-Kinesis-shaped stream transport seam (inputs/aws_kinesis.adoc,
  * internal/impl/aws/kinesis) — the shard model is Spark's natural
  * fit: ONE SHARD = ONE PARTITION, strictly ordered within, exactly
  * the kafka mapping of [[Broker]]:
  *
  *   - a stream is N shards; each shard owns an equal contiguous
  *     range of the 128-bit MD5 key space, and `PutRecord` routes by
  *     MD5(partition_key) — AWS's documented routing, reproduced
  *     bit-for-bit so a relational oracle can recompute shard
  *     assignment;
  *   - sequence numbers are per-shard monotone (opaque strings on the
  *     real service; monotone longs here — the contract is ordering,
  *     not representation);
  *   - the reference checkpoints the latest ACKNOWLEDGED sequence per
  *     shard in a DynamoDB table and resumes from it
  *     (aws_kinesis.adoc:127-129, at-least-once). The analog is a
  *     [[Cursors.Store]] keyed `<table>/<stream>/<shard>`, committed
  *     only AFTER the read materializes (commit-after-delivery);
  *   - `streams` elements are `name` (all shards) or `name:3`
  *     (explicit shard — aws_kinesis.adoc:148);
  *   - `start_from_oldest` = TRIM_HORIZON vs LATEST for shards with
  *     no stored sequence (aws_kinesis.adoc:423);
  *   - metadata per input_record_batcher.go:63-68: kinesis_stream,
  *     kinesis_shard, kinesis_partition_key, kinesis_sequence_number.
  *
  * Shard-balancing leases coordinate COMPETING PROCESSES on the real
  * service; a Spark read owns every shard it plans (the scheduler is
  * the balancer), so lease stealing has no analog here and the
  * checkpoint table carries only sequences.
  */
object Kinesis {

  final case class Record(sequence: Long, partitionKey: String,
                          data: Array[Byte], arrivalMs: Long)

  /** MD5(key) as an unsigned 128-bit value → owning shard index for
    * an N-shard stream with equal hash ranges (shard i owns
    * [i·2^128/N, (i+1)·2^128/N)).
    */
  def shardForKey(key: String, shards: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val h = BigInt(1, md) // unsigned
    ((h * shards) >> 128).toInt
  }

  trait Transport {
    def createStream(name: String, shards: Int): Unit
    def shardCount(name: String): Int
    /** Routes by MD5(partitionKey); returns (shard, sequence). */
    def putRecord(stream: String, partitionKey: String,
                  data: Array[Byte]): (Int, Long)
    /** Ordered scan of one shard over sequences (from, until]. */
    def getRecords(stream: String, shard: Int, fromExclusive: Long,
                   untilInclusive: Long): Iterator[Record]
    /** Latest sequence in a shard (0 = empty). */
    def latestSequence(stream: String, shard: Int): Long
  }

  final class InMemory extends Transport {
    private val streams = TrieMap.empty[String, Vector[ArrayBuffer[Record]]]
    private val clock = new AtomicLong(0)

    def createStream(name: String, shards: Int): Unit = {
      require(shards > 0, "kinesis: shards > 0")
      streams.putIfAbsent(name,
        Vector.fill(shards)(ArrayBuffer.empty[Record]))
      ()
    }

    private def s(name: String): Vector[ArrayBuffer[Record]] =
      streams.getOrElse(name,
        throw new IllegalArgumentException(s"unknown stream: $name"))

    def shardCount(name: String): Int = s(name).size

    def putRecord(stream: String, partitionKey: String,
                  data: Array[Byte]): (Int, Long) = {
      val shards = s(stream)
      val i = shardForKey(partitionKey, shards.size)
      val log = shards(i)
      log.synchronized {
        val seq = log.length.toLong + 1
        log += Record(seq, partitionKey, data, clock.incrementAndGet())
        (i, seq)
      }
    }

    def getRecords(stream: String, shard: Int, fromExclusive: Long,
                   untilInclusive: Long): Iterator[Record] = {
      val log = s(stream)(shard)
      log.synchronized {
        log.slice(fromExclusive.toInt,
          math.min(untilInclusive, log.length).toInt).toVector
      }.iterator
    }

    def latestSequence(stream: String, shard: Int): Long = {
      val log = s(stream)(shard)
      log.synchronized(log.length.toLong)
    }
  }

  private val registry = TrieMap.empty[String, InMemory]
  def named(name: String): InMemory =
    registry.getOrElseUpdate(name, new InMemory)
  def drop(name: String): Unit = { registry.remove(name); () }

  def transportFor(address: String): Transport =
    if (address.startsWith("mem://")) named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no Kinesis transport for '$address' in this environment " +
        "(mem:// is the in-process fake; the real service needs its SDK)")

  /** `name` → every shard; `name:3` → that shard only. */
  private[sources] def parseStreams(t: Transport,
                                    streams: Seq[String]): Seq[(String, Int)] =
    streams.flatMap { sp =>
      sp.split(":") match {
        case Array(name) =>
          (0 until t.shardCount(name)).map(name -> _)
        case Array(name, shard) => Seq(name -> shard.toInt)
        case _ => throw new IllegalArgumentException(s"stream spec: $sp")
      }
    }

  /** Bounded catch-up read: one Spark partition per shard, strictly
    * sequence-ordered within, resuming each shard from its stored
    * checkpoint (or oldest/latest per `startFromOldest` when none).
    * The per-shard high-water marks are committed back to the store
    * only after the scan materializes (eager localCheckpoint) —
    * commit-after-delivery, so a failed read redelivers
    * (at-least-once, aws_kinesis.adoc:129).
    */
  def read(spark: SparkSession, address: String, streams: Seq[String],
           checkpoint: Option[(Cursors.Store, String)] = None,
           startFromOldest: Boolean = true): DataFrame = {
    val t = transportFor(address)
    def ckKey(table: String, stream: String, shard: Int) =
      s"$table/$stream/$shard"
    val plan = parseStreams(t, streams).map { case (stream, shard) =>
      val stored = checkpoint.flatMap { case (store, table) =>
        store.get(ckKey(table, stream, shard)).map(_.toLong)
      }
      val from = stored.getOrElse(
        if (startFromOldest) 0L else t.latestSequence(stream, shard))
      (stream, shard, from, t.latestSequence(stream, shard))
    }
    val rows = spark.sparkContext
      .parallelize(plan, math.max(1, plan.size))
      .flatMap { case (stream, shard, from, until) =>
        Kinesis.transportFor(address).getRecords(stream, shard, from, until)
          .map { r =>
            val meta = Map(
              "kinesis_stream" -> stream,
              "kinesis_shard" -> shard.toString,
              "kinesis_partition_key" -> r.partitionKey,
              "kinesis_sequence_number" -> r.sequence.toString)
            Row(new String(r.data, "UTF-8"), meta, null,
              (shard.toLong << 40) | r.sequence)
          }
      }
    val df = spark.createDataFrame(rows, BrokerStream.schema)
      .localCheckpoint()
    checkpoint.foreach { case (store, table) =>
      // the materialized scan is the delivery: store each planned
      // shard's new high-water mark (bounded: one row per shard)
      plan.foreach { case (stream, shard, _, until) =>
        store.set(ckKey(table, stream, shard), until.toString)
      }
    }
    df
  }

  /** PutRecord per row, routed by the partition-key column through
    * the MD5 hash ranges executor-side — a narrow pass, no shuffle;
    * cross-task interleaving matches competing producers (per-shard
    * order follows task order, deterministic under a single sorted
    * partition — the oracle gate's setup).
    */
  def write(df: DataFrame, address: String, stream: String,
            partitionKeyCol: String, valueCol: String = "value"): Unit = {
    val kIdx = df.schema.fieldIndex(partitionKeyCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = Kinesis.transportFor(address)
      it.foreach { r =>
        t.putRecord(stream, r.get(kIdx).toString,
          r.getString(vIdx).getBytes("UTF-8"))
        ()
      }
    }
  }
}
