package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** NSQ-shaped transport (inputs/nsq.adoc, outputs/nsq.adoc;
  * internal/impl/beanstalkd-sized surface — the reference consumer is
  * Reserve-thin: subscribe, FIN on ack, REQ on nack):
  *
  *   - a TOPIC fans out to CHANNELS; every channel receives a copy of
  *     each message published while it exists (a channel created
  *     later starts empty), and consumers of ONE channel compete —
  *     exactly the Pub/Sub subscription model, so this adapter
  *     delegates to [[CloudQueue.PsInMemory]] (its own registry; the
  *     delivery state machine is identical, only the protocol surface
  *     differs);
  *   - FIN = ack, REQ = requeue (immediate redeliver, attempts+1),
  *     message timeout = lease expiry with attempts+1 — NSQ's
  *     `nsq_attempts` IS the delivery-attempt counter;
  *   - NSQ guarantees no order, so competing consumers per partition
  *     is the native read shape;
  *   - metadata per inputs/nsq.adoc:80-85: nsq_attempts, nsq_id,
  *     nsq_nsqd_address, nsq_timestamp (nanoseconds, like the NSQ
  *     wire format).
  */
object Nsq {

  private val registry = TrieMap.empty[String, CloudQueue.PsInMemory]

  def named(name: String): CloudQueue.PsInMemory =
    registry.getOrElseUpdate(name, new CloudQueue.PsInMemory)
  def named(name: String, clock: CloudQueue.Clock): CloudQueue.PsInMemory =
    registry.getOrElseUpdate(name, new CloudQueue.PsInMemory(clock))
  def drop(name: String): Unit = { registry.remove(name); () }

  def transportFor(address: String): CloudQueue.PsTransport =
    if (address.startsWith("mem://")) named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no NSQ transport for '$address' in this environment " +
        "(mem:// is the in-process fake; a real nsqd needs its client)")

  def createTopic(address: String, topic: String): Unit =
    transportFor(address).createTopic(topic)

  /** Channel creation = subscription: copies of everything published
    * AFTER this point.
    */
  def createChannel(address: String, topic: String, channel: String): Unit =
    transportFor(address).subscribe(topic, channel)

  def publish(address: String, topic: String, body: Array[Byte]): String =
    transportFor(address).publish(topic, body)

  /** FIN: finish (ack) a delivery — removes it from the channel. */
  def fin(address: String, channel: String, ackId: String): Boolean =
    transportFor(address).ack(channel, ackId)

  /** REQ: requeue a delivery — redelivers after `deferMs` (0 =
    * immediately) with `nsq_attempts` incremented on the next pull.
    */
  def req(address: String, channel: String, ackId: String,
          deferMs: Long = 0L): Boolean =
    transportFor(address).modifyAckDeadline(channel, ackId, deferMs)

  /** Bounded competing-consumer drain of one channel, FIN-on-emit
    * (ack), eager localCheckpoint for the destructive read (see
    * [[CloudQueue.sqsRead]]).
    */
  def read(spark: SparkSession, address: String, topic: String,
           channel: String, consumers: Int = 4, batchSize: Int = 32,
           msgTimeoutMs: Long = 60000L): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(0 until consumers, consumers)
      .flatMap { c =>
        val t = Nsq.transportFor(address)
        Iterator.continually(t.pull(channel, batchSize, msgTimeoutMs))
          .takeWhile(_.nonEmpty)
          .flatMap { batch =>
            batch.map { d =>
              t.ack(channel, d.ackId) // FIN
              val meta = Map(
                "nsq_id" -> d.message.messageId,
                "nsq_attempts" -> d.deliveryAttempt.toString,
                "nsq_nsqd_address" -> address.stripPrefix("mem://"),
                "nsq_timestamp" ->
                  (d.message.publishTimeMs * 1000000L).toString) ++
                d.message.attributes
              Row(new String(d.message.body, "UTF-8"), meta, null,
                (c.toLong << 40) | (d.message.messageId.drop(3).toLong))
            }
          }
      }
    spark.createDataFrame(rows, BrokerStream.schema).localCheckpoint()
  }

  /** Publish every row's value to the topic — narrow pass, no shuffle. */
  def write(df: DataFrame, address: String, topic: String,
            valueCol: String = "value"): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = Nsq.transportFor(address)
      it.foreach { r =>
        t.publish(topic, r.getString(vIdx).getBytes("UTF-8"))
        ()
      }
    }
  }
}
