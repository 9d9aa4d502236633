package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Azure-Queue-Storage-shaped transport (inputs/azure_queue_storage
  * .adoc, internal/impl/azure/input_queue_storage.go:130-180): the
  * delivery state machine is SQS's — dequeue leases a message for
  * `dequeue_visibility_timeout`, expiry redelivers with the dequeue
  * count incremented, delete-by-pop-receipt acks — so this adapter
  * delegates to [[CloudQueue.SqsInMemory]] (its own registry) and
  * maps the Azure metadata surface:
  *
  *   - queue_storage_insertion_time (RFC3339 of enqueue time),
  *   - queue_storage_queue_name,
  *   - queue_storage_message_lag when `track_properties` — the
  *     queue's approximate count minus this dequeue's batch
  *     (input_queue_storage.go:170-174),
  *   - all user-defined QUEUE metadata (queue-level properties,
  *     identical on every message).
  */
object AzureQueue {

  private val registry = TrieMap.empty[String, CloudQueue.SqsInMemory]
  private val queueMeta = TrieMap.empty[String, Map[String, String]]

  def named(name: String): CloudQueue.SqsInMemory =
    registry.getOrElseUpdate(name, new CloudQueue.SqsInMemory)
  def named(name: String, clock: CloudQueue.Clock): CloudQueue.SqsInMemory =
    registry.getOrElseUpdate(name, new CloudQueue.SqsInMemory(clock))
  def drop(name: String): Unit = {
    registry.remove(name); queueMeta.remove(name); ()
  }

  def transportFor(address: String): CloudQueue.SqsInMemory =
    if (address.startsWith("mem://")) named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no Azure queue transport for '$address' in this environment " +
        "(mem:// is the in-process fake; the real service needs its SDK)")

  /** Queue-level user metadata (props.Metadata — stamped onto every
    * dequeued message).
    */
  def setQueueMetadata(address: String, queue: String,
                       meta: Map[String, String]): Unit =
    queueMeta.update(address.stripPrefix("mem://") + "/" + queue, meta)

  def createQueue(address: String, queue: String): Unit =
    transportFor(address).createQueue(queue)

  def enqueue(address: String, queue: String, body: Array[Byte]): Unit = {
    transportFor(address).send(queue, body)
    ()
  }

  /** Bounded competing-consumer dequeue, delete-on-emit, destructive
    * read pinned with an eager localCheckpoint (see
    * [[CloudQueue.sqsRead]]).
    */
  def read(spark: SparkSession, address: String, queue: String,
           consumers: Int = 4, batchSize: Int = 32,
           visibilityTimeoutMs: Long = 30000L,
           trackProperties: Boolean = false): DataFrame = {
    val qMeta = queueMeta
      .getOrElse(address.stripPrefix("mem://") + "/" + queue, Map.empty)
    val rows = spark.sparkContext
      .parallelize(0 until consumers, consumers)
      .flatMap { c =>
        val t = AzureQueue.transportFor(address)
        Iterator.continually {
          val approx = if (trackProperties) t.depth(queue) else 0L
          (approx, t.receive(queue, batchSize, visibilityTimeoutMs))
        }.takeWhile(_._2.nonEmpty)
          .flatMap { case (approx, batch) =>
            val lag = math.max(0L, approx - batch.size)
            batch.map { d =>
              t.delete(queue, d.receiptHandle)
              val meta = Map(
                "queue_storage_insertion_time" ->
                  java.time.Instant.ofEpochMilli(d.message.enqueuedMs)
                    .toString,
                "queue_storage_queue_name" -> queue) ++
                (if (trackProperties)
                   Map("queue_storage_message_lag" -> lag.toString)
                 else Map.empty) ++ qMeta
              Row(new String(d.message.body, "UTF-8"), meta, null,
                (c.toLong << 40) | (d.message.messageId.drop(4).toLong))
            }
          }
      }
    spark.createDataFrame(rows, BrokerStream.schema).localCheckpoint()
  }

  /** Enqueue every row's value — narrow pass, no shuffle. */
  def write(df: DataFrame, address: String, queue: String,
            valueCol: String = "value"): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = AzureQueue.transportFor(address)
      it.foreach { r =>
        t.send(queue, r.getString(vIdx).getBytes("UTF-8"))
        ()
      }
    }
  }
}
