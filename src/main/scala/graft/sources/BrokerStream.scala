package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming broker input as a native DataSourceV2 micro-batch source —
  * the Spark-idiomatic form of the reference's resumable kafka consumer
  * (franz_reader_ordered.go: per-partition offset tracking, strict
  * offset order within a partition, resume-from-committed):
  *
  *   - an [[Offset]] is the per-partition next-offset map, serialized
  *     as JSON into the checkpoint log — Spark's own commit protocol
  *     provides resume-exactly-from-committed across restarts, the same
  *     guarantee the reference gets from consumer-group commits;
  *   - each micro-batch plans ONE [[InputPartition]] per broker
  *     partition over [from, until) — parallelism = broker partitions,
  *     identical to the batch `Sources.brokerRead` and to a real
  *     consumer group's assignment;
  *   - readers resolve the transport by ADDRESS executor-side (the
  *     `mem://` registry; a real-cluster transport plugs into the same
  *     seam), so tasks carry only strings.
  *
  * Usage: `spark.readStream.format("graft.sources.BrokerSourceProvider")
  * .option("address", "mem://x").option("topic", "t").load()` — the
  * config runner's streaming kafka input compiles to exactly this.
  * Output schema is the broker envelope of [[Sources.brokerRead]]
  * (value, metadata incl. kafka_* keys, error, __seq = offset).
  */
class BrokerSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new BrokerStream.BrokerTable(
      properties.get("address"), properties.get("topic"))
}

object BrokerStream {

  val schema: StructType = StructType(Seq(
    StructField(Envelope.ValueCol, StringType),
    StructField(Envelope.MetadataCol, MapType(StringType, StringType)),
    StructField(Envelope.ErrorCol, StringType),
    StructField("__seq", LongType, nullable = false)))

  final class BrokerTable(address: String, topic: String)
      extends Table with SupportsRead {
    require(address != null && topic != null,
      "broker stream needs address and topic options")
    override def name(): String = s"broker:$address/$topic"
    override def schema(): StructType = BrokerStream.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new BrokerScan(address, topic)
      }
  }

  final class BrokerScan(address: String, topic: String) extends Scan {
    override def readSchema(): StructType = BrokerStream.schema
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new BrokerMicroBatchStream(address, topic)
    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] = {
        val t = Broker.transportFor(address)
        (0 until t.partitionCount(topic)).map { p =>
          BrokerRange(address, topic, p, 0L, t.endOffset(topic, p))
            : InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new BrokerReaderFactory
    }
  }

  /** Per-partition next-offset watermark, JSON in the checkpoint log. */
  final case class BrokerOffset(parts: Map[Int, Long]) extends Offset {
    override def json(): String =
      parts.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
  }

  object BrokerOffset {
    def parse(json: String): BrokerOffset = BrokerOffset(
      json.trim.stripPrefix("{").stripSuffix("}").split(",")
        .filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split(":", 2)
          k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
        }.toMap)
  }

  final class BrokerMicroBatchStream(address: String, topic: String)
      extends MicroBatchStream {
    private def transport = Broker.transportFor(address)

    override def initialOffset(): Offset = {
      // earliest — the kafka input's default auto_offset_reset; a topic
      // that does not exist yet starts empty rather than failing
      val t = transport
      val n = try t.partitionCount(topic) catch { case _: Exception => 0 }
      BrokerOffset((0 until n).map(_ -> 0L).toMap)
    }

    override def latestOffset(): Offset = {
      // same unknown-topic guard as initialOffset: a stream may start
      // before any producer creates the topic — stay empty, don't die
      val t = transport
      val n = try t.partitionCount(topic) catch { case _: Exception => 0 }
      BrokerOffset((0 until n).map(p => p -> t.endOffset(topic, p)).toMap)
    }

    override def deserializeOffset(json: String): Offset =
      BrokerOffset.parse(json)

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[BrokerOffset].parts
      val e = end.asInstanceOf[BrokerOffset].parts
      // a partition may appear mid-stream (topic grew): its start is 0
      e.toSeq.sortBy(_._1).collect {
        case (p, until) if until > s.getOrElse(p, 0L) =>
          BrokerRange(address, topic, p, s.getOrElse(p, 0L), until): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new BrokerReaderFactory

    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  final case class BrokerRange(address: String, topic: String, partition: Int,
                               from: Long, until: Long) extends InputPartition

  final class BrokerReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val r = partition.asInstanceOf[BrokerRange]
      new BrokerPartitionReader(r)
    }
  }

  /** Offset-ordered scan of one partition range; builds the same
    * envelope (incl. kafka_* metadata) as the batch `brokerRead`.
    */
  final class BrokerPartitionReader(r: BrokerRange)
      extends PartitionReader[InternalRow] {
    private val it =
      Broker.transportFor(r.address).fetch(r.topic, r.partition, r.from, r.until)
    private var current: InternalRow = _

    override def next(): Boolean =
      if (!it.hasNext) false
      else {
        val rec = it.next()
        val tombstone = rec.value == null
        val meta = Map(
          "kafka_key" -> (if (rec.key == null) null
                          else new String(rec.key, "UTF-8")),
          "kafka_topic" -> r.topic,
          "kafka_partition" -> rec.partition.toString,
          "kafka_offset" -> rec.offset.toString,
          "kafka_timestamp_ms" -> rec.timestampMs.toString,
          "kafka_timestamp_unix" -> (rec.timestampMs / 1000L).toString,
          // lag relative to this micro-batch's planned high-water mark
          "kafka_lag" -> math.max(r.until - rec.offset, 0L).toString,
          "kafka_tombstone_message" -> tombstone.toString) ++ rec.headers
        // one toSeq for BOTH arrays: mapping .keys (a Set) would
        // re-hash into a different iteration order than .values
        val kvs = meta.toSeq
        val keys = new GenericArrayData(
          kvs.map(kv => UTF8String.fromString(kv._1)).toArray[Any])
        val vals = new GenericArrayData(kvs.map(kv =>
          if (kv._2 == null) null else UTF8String.fromString(kv._2)).toArray[Any])
        current = InternalRow(
          if (tombstone) null else UTF8String.fromString(new String(rec.value, "UTF-8")),
          new ArrayBasedMapData(keys, vals),
          null,
          rec.offset)
        true
      }

    override def get(): InternalRow = current
    override def close(): Unit = ()
  }
}
