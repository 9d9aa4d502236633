package graft.sources

import java.util.{Map => JMap}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming form for CURSOR-BEARING poll inputs (jira / discord /
  * twitter_search): the reference runs these as a continuous poll loop
  * — one incremental sweep per tick, cursor advanced only after
  * delivery (input_jira.go:55-80 cursor contract). The Spark-idiomatic
  * form is a DataSourceV2 micro-batch source whose OFFSET IS THE
  * CURSOR:
  *
  *   - each trigger runs one sweep (`Poller`: cursor in → fresh
  *     payloads + advanced cursor out) on the driver — the same
  *     single-poller admission the batch inputs use; row volume per
  *     sweep is incremental by construction, backfills take the batch
  *     input;
  *   - the advanced cursor is serialized INTO the offset, so Spark's
  *     checkpoint WAL commits cursor and data position atomically —
  *     restart resumes from the committed cursor with no re-emission,
  *     the transactional form of the `Cursors` store persistence;
  *   - a batch replanned after a crash (offset logged, rows lost with
  *     the driver) finds its buffered sweep gone and RE-POLLS from the
  *     committed `start` cursor — the at-least-once retry the
  *     reference gets from cursor-after-delivery;
  *   - payloads ride in the InputPartitions (driver → executor), split
  *     across `parallelism` partitions.
  *
  * Usage: `PollStream.register(name, poller)` then
  * `spark.readStream.format("graft.sources.PollSourceProvider")
  * .option("poller", name).load()`. Output schema is the broker
  * envelope (value, metadata, error, __seq = sweep emission order).
  */
object PollStream {

  /** value + metadata payload of one emitted message. */
  type Payload = (String, Map[String, String])

  /** One incremental sweep: prior cursor (None = first ever) →
    * (fresh payloads, advanced cursor).
    */
  type Poller = Option[String] => (Vector[Payload], Option[String])

  private val registry = TrieMap.empty[String, Poller]

  def register(name: String, poller: Poller): Unit =
    registry.update(name, poller)
  def drop(name: String): Unit = { registry.remove(name); () }
  private[sources] def pollerFor(name: String): Poller =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"poll: no poller '$name'"))

  /** sweep = monotone micro-batch counter; cursor = the connector
    * cursor AFTER that sweep (null before the first).
    */
  final case class PollOffset(sweep: Long, cursor: String) extends Offset {
    override def json(): String = {
      val c =
        if (cursor == null) "null"
        else "\"" + cursor.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
          case ch => ch.toString
        } + "\""
      s"""{"sweep":$sweep,"cursor":$c}"""
    }
  }

  object PollOffset {
    def parse(json: String): PollOffset = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = m.readTree(json)
      PollOffset(n.get("sweep").asLong,
        if (n.get("cursor").isNull) null else n.get("cursor").asText)
    }
  }

  final class PollMicroBatchStream(pollerName: String, parallelism: Int)
      extends MicroBatchStream with SupportsAdmissionControl {

    // pending sweeps not yet committed: sweep id → payloads
    private val pending = TrieMap.empty[Long, Vector[Payload]]

    private def asPoll(o: Offset): PollOffset = o match {
      case p: PollOffset => p
      case other => PollOffset.parse(other.json())
    }

    override def initialOffset(): Offset = PollOffset(0L, null)

    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

    /** Admission control so the START position (incl. the cursor
      * restored from the checkpoint on restart) arrives as an
      * argument — the plain `latestOffset()` has no way to learn the
      * committed cursor before its first poll.
      */
    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val cur = asPoll(start)
      val (rows, next) = pollerFor(pollerName)(Option(cur.cursor))
      // an empty sweep that MOVED the cursor still advances (commits)
      // the offset — e.g. a stale-cursor reset must reach the WAL or
      // the reset would be re-attempted forever
      if (rows.isEmpty && next.orNull == cur.cursor) cur
      else {
        val adv = PollOffset(cur.sweep + 1, next.orNull)
        pending.update(adv.sweep, rows)
        adv
      }
    }

    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "poll: latestOffset(start, limit) is the admission-control form")

    override def deserializeOffset(json: String): Offset =
      PollOffset.parse(json)

    override def planInputPartitions(start: Offset,
                                     end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[PollOffset]
      val e = end.asInstanceOf[PollOffset]
      if (e.sweep <= s.sweep) return Array.empty
      val sweeps = (s.sweep + 1) to e.sweep
      // recovery: a logged-but-lost batch (driver restart) re-polls
      // from the committed start cursor — at-least-once re-fetch
      val rows: Vector[Payload] =
        if (sweeps.forall(pending.contains))
          sweeps.flatMap(pending(_)).toVector
        else {
          val (re, _) = pollerFor(pollerName)(Option(s.cursor))
          pending.update(e.sweep, re)
          re
        }
      if (rows.isEmpty) return Array.empty
      val per = math.max(1, (rows.size + parallelism - 1) / parallelism)
      rows.grouped(per).zipWithIndex.map { case (chunk, i) =>
        PollChunk(chunk, i.toLong * per): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PollReaderFactory

    override def commit(end: Offset): Unit = {
      val e = end.asInstanceOf[PollOffset]
      pending.keys.filter(_ <= e.sweep).foreach(pending.remove)
    }

    override def stop(): Unit = ()
  }

  final case class PollChunk(rows: Vector[Payload], baseSeq: Long)
      extends InputPartition

  final class PollReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val c = p.asInstanceOf[PollChunk]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < c.rows.size }
        override def get(): InternalRow = {
          val (value, meta) = c.rows(i)
          val kvs = meta.toSeq
          val keys = new GenericArrayData(
            kvs.map(kv => UTF8String.fromString(kv._1)).toArray[Any])
          val vals = new GenericArrayData(kvs.map(kv =>
            if (kv._2 == null) null
            else UTF8String.fromString(kv._2)).toArray[Any])
          InternalRow(
            if (value == null) null else UTF8String.fromString(value),
            new ArrayBasedMapData(keys, vals), null, c.baseSeq + i)
        }
        override def close(): Unit = ()
      }
    }
  }

  final class PollTable(pollerName: String, parallelism: Int)
      extends Table with SupportsRead {
    require(pollerName != null, "poll: missing 'poller' option")
    override def name(): String = s"poll:$pollerName"
    override def schema(): StructType = BrokerStream.schema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.Set.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = BrokerStream.schema
          override def toMicroBatchStream(loc: String): MicroBatchStream =
            new PollMicroBatchStream(pollerName, parallelism)
        }
      }
  }
}

class PollSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PollStream.PollTable(properties.get("poller"),
      Option(properties.get("parallelism")).map(_.toInt).getOrElse(4))
}
