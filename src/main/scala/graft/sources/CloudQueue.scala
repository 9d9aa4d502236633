package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Cloud-queue transport seam — the fifth and sixth applications of the
  * injectable-transport template (Broker = kafka, Mq = amqp_0_9,
  * PubSub = nats/mqtt): AWS-SQS-shaped and GCP-Pub/Sub-shaped
  * delivery semantics (inputs/aws_sqs.adoc, outputs/aws_sqs.adoc,
  * inputs/gcp_pubsub.adoc, outputs/gcp_pubsub.adoc). The real cloud
  * services need their SDKs (absent in this environment — declared
  * env-blocked); what this module implements is the part a PIPELINE
  * observes, against the services' public wire contracts:
  *
  * SQS (standard + FIFO, public AWS semantics):
  *   - receive leases a message for `visibility_timeout` ms: it stays
  *     in the queue but is invisible; an unreplaced lease expiring
  *     makes it deliverable again with `ApproximateReceiveCount`
  *     incremented and a FRESH receipt handle;
  *   - `delete_message` (ack) removes by CURRENT receipt handle only —
  *     a stale handle from a previous delivery is a silent no-op,
  *     exactly AWS's documented behavior;
  *   - `reset_visibility` (nack, inputs/aws_sqs.adoc:123) sets the
  *     visibility timeout of the consumed message to zero so it
  *     redelivers immediately;
  *   - FIFO: `message_group_id` serializes delivery per group (the
  *     next message of a group is only deliverable once every earlier
  *     one is deleted), and `message_deduplication_id` drops re-sends
  *     within the 5-minute dedup window (outputs/aws_sqs.adoc:132-150);
  *   - metadata per inputs/aws_sqs.adoc:90-97: sqs_message_id,
  *     sqs_receipt_handle, sqs_approximate_receive_count + all
  *     message attributes.
  *
  * Pub/Sub (public GCP semantics):
  *   - topics fan out to SUBSCRIPTIONS; a subscription receives every
  *     message published while it exists (one created later starts
  *     empty — no replay);
  *   - pull leases a message until `ack_deadline` ms pass; expiry
  *     redelivers with `delivery_attempt` incremented; ack removes;
  *     a nack (modack 0) redelivers immediately;
  *   - `ordering_key` (outputs/gcp_pubsub.adoc:168) serializes
  *     delivery per key within a subscription;
  *   - metadata per inputs/gcp_pubsub.adoc:76-84:
  *     gcp_pubsub_message_id, gcp_pubsub_publish_time_unix,
  *     gcp_pubsub_delivery_attempt, gcp_pubsub_ordering_key + all
  *     message attributes.
  *
  * Time is injectable (`Clock`) so lease expiry is driven
  * deterministically in specs instead of sleeping. `mem://<name>`
  * resolves to the in-process fakes; real services need their SDK
  * clients at this seam.
  */
object CloudQueue {

  /** Injectable time source: specs advance it manually. */
  final class Clock(start: Long = 0L) {
    private val t = new AtomicLong(start)
    def nowMs: Long = t.get
    def advance(ms: Long): Unit = { t.addAndGet(ms); () }
  }

  // ───────────────────────────── SQS ─────────────────────────────

  final case class SqsMessage(messageId: String, body: Array[Byte],
                              attributes: Map[String, String],
                              groupId: Option[String],
                              dedupId: Option[String],
                              enqueuedMs: Long = 0L)

  /** One delivered lease: the receipt handle is delivery-scoped. */
  final case class SqsDelivery(message: SqsMessage, receiptHandle: String,
                               receiveCount: Int)

  /** SQS-shaped queue transport contract. */
  trait SqsTransport {
    def createQueue(name: String, fifo: Boolean = false): Unit
    /** Returns None when a FIFO dedup id suppressed the send. */
    def send(queue: String, body: Array[Byte],
             attributes: Map[String, String] = Map.empty,
             groupId: Option[String] = None,
             dedupId: Option[String] = None,
             delayMs: Long = 0L): Option[String]
    def receive(queue: String, max: Int, visibilityTimeoutMs: Long): Seq[SqsDelivery]
    /** delete_message: ack by CURRENT receipt handle; stale = no-op. */
    def delete(queue: String, receiptHandle: String): Boolean
    /** reset_visibility: nack → immediately deliverable again. */
    def changeVisibility(queue: String, receiptHandle: String,
                         visibilityTimeoutMs: Long): Boolean
    /** Visible + in-flight (AWS ApproximateNumberOfMessages + NotVisible). */
    def depth(queue: String): Long
  }

  final class SqsInMemory(val clock: Clock = new Clock) extends SqsTransport {
    private case class Entry(msg: SqsMessage, var visibleAt: Long,
                             var receiveCount: Int,
                             var receiptHandle: String)
    private case class Q(fifo: Boolean,
                         entries: mutable.ArrayBuffer[Entry] = mutable.ArrayBuffer.empty,
                         dedupSeen: mutable.Map[String, Long] = mutable.Map.empty)
    private val queues = TrieMap.empty[String, Q]
    private val idGen = new AtomicLong(0)
    private val DedupWindowMs = 5 * 60 * 1000L

    private def q(name: String): Q = queues.getOrElse(name,
      throw new IllegalArgumentException(s"unknown queue: $name"))

    def createQueue(name: String, fifo: Boolean): Unit = {
      queues.putIfAbsent(name, Q(fifo)); ()
    }

    def send(queue: String, body: Array[Byte],
             attributes: Map[String, String], groupId: Option[String],
             dedupId: Option[String], delayMs: Long): Option[String] = {
      require(delayMs >= 0 && delayMs <= 900000L,
        "delay between 0 and 900 seconds (outputs/aws_sqs.adoc:152)")
      val qq = q(queue)
      qq.synchronized {
        val now = clock.nowMs
        if (qq.fifo) dedupId.foreach { d =>
          qq.dedupSeen.get(d) match {
            case Some(t) if now - t < DedupWindowMs => return None
            case _ => qq.dedupSeen(d) = now
          }
        }
        val id = s"sqs-${idGen.incrementAndGet()}"
        qq.entries += Entry(
          SqsMessage(id, body, attributes, groupId, dedupId, now),
          visibleAt = now + delayMs, receiveCount = 0, receiptHandle = "")
        Some(id)
      }
    }

    def receive(queue: String, max: Int,
                visibilityTimeoutMs: Long): Seq[SqsDelivery] = {
      val qq = q(queue)
      qq.synchronized {
        val now = clock.nowMs
        // FIFO: a group is blocked while ANY earlier message of the
        // group is still present and in flight (leased) — per-group
        // order survives competing consumers
        val leasedGroups: Set[String] =
          if (!qq.fifo) Set.empty
          else qq.entries.iterator
            .filter(e => e.visibleAt > now)
            .flatMap(_.msg.groupId).toSet
        val out = mutable.ArrayBuffer.empty[SqsDelivery]
        val takenGroups = mutable.Set.empty[String]
        val it = qq.entries.iterator
        while (out.size < max && it.hasNext) {
          val e = it.next()
          val grp = e.msg.groupId
          val groupBlocked = qq.fifo && grp.exists(g =>
            leasedGroups.contains(g) || takenGroups.contains(g))
          if (e.visibleAt <= now && !groupBlocked) {
            e.visibleAt = now + visibilityTimeoutMs
            e.receiveCount += 1
            e.receiptHandle = s"rh-${idGen.incrementAndGet()}"
            out += SqsDelivery(e.msg, e.receiptHandle, e.receiveCount)
          }
          // in a FIFO queue, once we pass over a group's head (leased
          // or just taken), its later messages must wait too
          if (qq.fifo && e.visibleAt > now) grp.foreach(takenGroups += _)
        }
        out.toSeq
      }
    }

    def delete(queue: String, receiptHandle: String): Boolean = {
      val qq = q(queue)
      qq.synchronized {
        // AWS accepts DeleteMessage with the LATEST receipt handle even
        // after the visibility timeout lapses — a handle is invalidated
        // only when a re-receive issues a fresh one (receiptHandle is
        // overwritten then, so matching the current handle IS the
        // "most recent" check)
        val i = qq.entries.indexWhere(_.receiptHandle == receiptHandle)
        if (i < 0) false // stale handle: silent no-op (AWS semantics)
        else { qq.entries.remove(i); true }
      }
    }

    def changeVisibility(queue: String, receiptHandle: String,
                         visibilityTimeoutMs: Long): Boolean = {
      val qq = q(queue)
      qq.synchronized {
        qq.entries.find(_.receiptHandle == receiptHandle) match {
          case Some(e) => e.visibleAt = clock.nowMs + visibilityTimeoutMs; true
          case None => false
        }
      }
    }

    def depth(queue: String): Long =
      { val qq = q(queue); qq.synchronized(qq.entries.length.toLong) }
  }

  // ──────────────────────────── Pub/Sub ───────────────────────────

  final case class PsMessage(messageId: String, body: Array[Byte],
                             attributes: Map[String, String],
                             orderingKey: String, publishTimeMs: Long)

  final case class PsDelivery(message: PsMessage, ackId: String,
                              deliveryAttempt: Int)

  trait PsTransport {
    def createTopic(name: String): Unit
    /** A subscription only sees messages published AFTER it exists. */
    def subscribe(topic: String, subscription: String): Unit
    def publish(topic: String, body: Array[Byte],
                attributes: Map[String, String] = Map.empty,
                orderingKey: String = ""): String
    def pull(subscription: String, max: Int, ackDeadlineMs: Long): Seq[PsDelivery]
    def ack(subscription: String, ackId: String): Boolean
    /** modifyAckDeadline(0) = nack → immediate redelivery. */
    def modifyAckDeadline(subscription: String, ackId: String,
                          deadlineMs: Long): Boolean
    def backlog(subscription: String): Long
  }

  final class PsInMemory(val clock: Clock = new Clock) extends PsTransport {
    private case class Entry(msg: PsMessage, var leasedUntil: Long,
                             var attempts: Int, var ackId: String)
    private val topics = TrieMap.empty[String, mutable.ArrayBuffer[String]]
    private val subs = TrieMap.empty[String, mutable.ArrayBuffer[Entry]]
    private val idGen = new AtomicLong(0)

    def createTopic(name: String): Unit = {
      topics.putIfAbsent(name, mutable.ArrayBuffer.empty); ()
    }

    def subscribe(topic: String, subscription: String): Unit = {
      val t = topics.getOrElse(topic,
        throw new IllegalArgumentException(s"unknown topic: $topic"))
      t.synchronized {
        subs.putIfAbsent(subscription, mutable.ArrayBuffer.empty)
        if (!t.contains(subscription)) { t += subscription; () }
      }
    }

    def publish(topic: String, body: Array[Byte],
                attributes: Map[String, String],
                orderingKey: String): String = {
      val t = topics.getOrElse(topic,
        throw new IllegalArgumentException(s"unknown topic: $topic"))
      val id = s"ps-${idGen.incrementAndGet()}"
      val msg = PsMessage(id, body, attributes, orderingKey, clock.nowMs)
      t.synchronized {
        t.foreach { s =>
          val log = subs(s)
          log.synchronized {
            log += Entry(msg, leasedUntil = 0L, attempts = 0, ackId = "")
            ()
          }
        }
      }
      id
    }

    private def sub(name: String): mutable.ArrayBuffer[Entry] =
      subs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown subscription: $name"))

    def pull(subscription: String, max: Int,
             ackDeadlineMs: Long): Seq[PsDelivery] = {
      val log = sub(subscription)
      log.synchronized {
        val now = clock.nowMs
        val out = mutable.ArrayBuffer.empty[PsDelivery]
        // ordering keys serialize per key: once a key's earlier message
        // is outstanding (leased) or taken this pull, later ones wait
        val blockedKeys = mutable.Set.empty[String]
        log.foreach { e =>
          val key = e.msg.orderingKey
          val leased = e.leasedUntil > now
          if (leased && key.nonEmpty) blockedKeys += key
          else if (out.size < max && !leased &&
                   (key.isEmpty || !blockedKeys.contains(key))) {
            e.leasedUntil = now + ackDeadlineMs
            e.attempts += 1
            e.ackId = s"ack-${idGen.incrementAndGet()}"
            out += PsDelivery(e.msg, e.ackId, e.attempts)
            if (key.nonEmpty) blockedKeys += key
          }
        }
        out.toSeq
      }
    }

    def ack(subscription: String, ackId: String): Boolean = {
      val log = sub(subscription)
      log.synchronized {
        val i = log.indexWhere(e =>
          e.ackId == ackId && e.leasedUntil > clock.nowMs)
        if (i < 0) false else { log.remove(i); true }
      }
    }

    def modifyAckDeadline(subscription: String, ackId: String,
                          deadlineMs: Long): Boolean = {
      val log = sub(subscription)
      log.synchronized {
        log.find(_.ackId == ackId) match {
          case Some(e) => e.leasedUntil = clock.nowMs + deadlineMs; true
          case None => false
        }
      }
    }

    def backlog(subscription: String): Long =
      { val log = sub(subscription); log.synchronized(log.length.toLong) }
  }

  // ─────────────────── registries + Spark read/write ───────────────────

  private val sqsRegistry = TrieMap.empty[String, SqsInMemory]
  private val psRegistry = TrieMap.empty[String, PsInMemory]

  def sqsNamed(name: String): SqsInMemory =
    sqsRegistry.getOrElseUpdate(name, new SqsInMemory)
  def sqsNamed(name: String, clock: Clock): SqsInMemory =
    sqsRegistry.getOrElseUpdate(name, new SqsInMemory(clock))
  def psNamed(name: String): PsInMemory =
    psRegistry.getOrElseUpdate(name, new PsInMemory)
  def psNamed(name: String, clock: Clock): PsInMemory =
    psRegistry.getOrElseUpdate(name, new PsInMemory(clock))
  def dropSqs(name: String): Unit = { sqsRegistry.remove(name); () }
  def dropPs(name: String): Unit = { psRegistry.remove(name); () }

  def sqsTransportFor(address: String): SqsTransport =
    if (address.startsWith("mem://")) sqsNamed(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no SQS transport for '$address' in this environment " +
        "(mem:// is the in-process fake; the real service needs its SDK)")

  def psTransportFor(address: String): PsTransport =
    if (address.startsWith("mem://")) psNamed(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no Pub/Sub transport for '$address' in this environment " +
        "(mem:// is the in-process fake; the real service needs its SDK)")

  /** Bounded SQS read: N COMPETING CONSUMERS (one per partition), each
    * looping receive → emit → delete until its receives come back
    * empty — a standard queue's parallelism model (order is per
    * delivery, not global; a FIFO queue's per-group order survives via
    * the transport's group lock). Delete-on-emit is the bounded-batch
    * ack: a task failure leaves its leases to expire and redeliver
    * with an incremented receive count — at-least-once, like the
    * reference's ack-after-commit.
    *
    * The consumption is DESTRUCTIVE (receive leases, delete removes),
    * so the scan must evaluate exactly once: the result is pinned with
    * an eager localCheckpoint — a downstream re-evaluation (a sort's
    * range-partitioner sampling pass, an AQE re-plan) replays the
    * materialized blocks instead of re-receiving from a now-empty
    * queue. The continuous form would instead commit receipt handles
    * against a streaming checkpoint.
    */
  def sqsRead(spark: SparkSession, address: String, queue: String,
              consumers: Int = 4, batchSize: Int = 32,
              visibilityTimeoutMs: Long = 30000L,
              deleteMessage: Boolean = true): DataFrame = {
    // a zero lease would let a competing consumer re-receive (and
    // re-handle) a message before our delete lands — the drain's
    // takeWhile(nonEmpty) then never terminates
    require(visibilityTimeoutMs > 0,
      "sqsRead: visibility_timeout must be > 0 for the bounded drain")
    val rows = spark.sparkContext
      .parallelize(0 until consumers, consumers)
      .flatMap { c =>
        val t = CloudQueue.sqsTransportFor(address)
        Iterator.continually(t.receive(queue, batchSize, visibilityTimeoutMs))
          .takeWhile(_.nonEmpty)
          .flatMap { batch =>
            batch.map { d =>
              if (deleteMessage) t.delete(queue, d.receiptHandle)
              val meta = Map(
                "sqs_message_id" -> d.message.messageId,
                "sqs_receipt_handle" -> d.receiptHandle,
                "sqs_approximate_receive_count" -> d.receiveCount.toString) ++
                d.message.attributes
              Row(new String(d.message.body, "UTF-8"), meta, null,
                (c.toLong << 40) | (d.message.messageId.drop(4).toLong))
            }
          }
      }
    spark.createDataFrame(rows, BrokerStream.schema).localCheckpoint()
  }

  /** Publish every row to an SQS queue; group/dedup/delay resolve
    * per-row from optional columns (the adoc's per-message
    * interpolations). A narrow pass, no shuffle.
    */
  def sqsWrite(df: DataFrame, address: String, queue: String,
               valueCol: String = "value",
               groupIdCol: Option[String] = None,
               dedupIdCol: Option[String] = None,
               attributeCols: Seq[String] = Nil): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    val gIdx = groupIdCol.map(df.schema.fieldIndex)
    val dIdx = dedupIdCol.map(df.schema.fieldIndex)
    val aIdx = attributeCols.map(c => c -> df.schema.fieldIndex(c))
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = CloudQueue.sqsTransportFor(address)
      it.foreach { r =>
        val attrs = aIdx.collect {
          case (n, i) if !r.isNullAt(i) => n -> r.get(i).toString
        }.toMap
        t.send(queue, r.getString(vIdx).getBytes("UTF-8"), attrs,
          gIdx.filterNot(r.isNullAt).map(r.getString),
          dIdx.filterNot(r.isNullAt).map(r.getString))
        ()
      }
    }
  }

  /** Bounded Pub/Sub pull: competing consumers over one subscription,
    * ack-on-emit (same at-least-once shape as [[sqsRead]]).
    */
  def pubsubRead(spark: SparkSession, address: String, subscription: String,
                 consumers: Int = 4, batchSize: Int = 32,
                 ackDeadlineMs: Long = 30000L): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(0 until consumers, consumers)
      .flatMap { c =>
        val t = CloudQueue.psTransportFor(address)
        Iterator.continually(t.pull(subscription, batchSize, ackDeadlineMs))
          .takeWhile(_.nonEmpty)
          .flatMap { batch =>
            batch.map { d =>
              t.ack(subscription, d.ackId)
              val meta = Map(
                "gcp_pubsub_message_id" -> d.message.messageId,
                "gcp_pubsub_publish_time_unix" ->
                  (d.message.publishTimeMs / 1000L).toString,
                "gcp_pubsub_delivery_attempt" -> d.deliveryAttempt.toString,
                "gcp_pubsub_ordering_key" -> d.message.orderingKey) ++
                d.message.attributes
              Row(new String(d.message.body, "UTF-8"), meta, null,
                (c.toLong << 40) | (d.message.messageId.drop(3).toLong))
            }
          }
      }
    spark.createDataFrame(rows, BrokerStream.schema).localCheckpoint()
  }

  /** Publish rows to a topic; ordering key resolves per-row. */
  def pubsubWrite(df: DataFrame, address: String, topic: String,
                  valueCol: String = "value",
                  orderingKeyCol: Option[String] = None,
                  attributeCols: Seq[String] = Nil): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    val oIdx = orderingKeyCol.map(df.schema.fieldIndex)
    val aIdx = attributeCols.map(c => c -> df.schema.fieldIndex(c))
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = CloudQueue.psTransportFor(address)
      it.foreach { r =>
        val attrs = aIdx.collect {
          case (n, i) if !r.isNullAt(i) => n -> r.get(i).toString
        }.toMap
        t.publish(topic, r.getString(vIdx).getBytes("UTF-8"), attrs,
          oIdx.filterNot(r.isNullAt).map(r.getString).getOrElse(""))
        ()
      }
    }
  }
}
