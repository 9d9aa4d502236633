package graft.sources

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** AMQP-0.9-shaped message-queue transport seam — the same injectable
  * pattern as [[Broker.Transport]], for the reference's second broker
  * family (inputs/amqp_0_9.adoc, outputs/amqp_0_9.adoc; RabbitMQ
  * semantics):
  *
  *   - producers publish to an EXCHANGE with a routing key; the
  *     exchange routes copies into bound QUEUES by type — `direct`
  *     (binding key equals routing key), `fanout` (every bound queue),
  *     `topic` (dot-separated pattern with `*` = exactly one word,
  *     `#` = zero or more words — outputs/amqp_0_9.adoc
  *     exchange_declare.type);
  *   - a queue is a single FIFO log (consumption order = arrival
  *     order), and competing consumers trade that order away — so the
  *     Spark read maps ONE queue to ONE partition, and parallelism
  *     comes from reading many queues, exactly the trade a real AMQP
  *     deployment makes;
  *   - consumers surface amqp_* metadata (exchange, routing_key,
  *     delivery_tag, redelivered, content_type, …) plus headers
  *     (inputs/amqp_0_9.adoc Metadata).
  *
  * `mem://<name>` resolves to the in-process [[Mq.InMemory]] fake (a
  * documented test transport, NOT a server); real brokers need an AMQP
  * client at this seam.
  */
object Mq {

  final case class Message(body: Array[Byte], exchange: String,
                           routingKey: String,
                           headers: Map[String, String] = Map.empty,
                           contentType: String = "application/octet-stream",
                           deliveryTag: Long = 0L)

  /** Minimal AMQP-shaped contract: declare topology, publish, scan. */
  trait Transport {
    def declareExchange(name: String, exchangeType: String): Unit
    def declareQueue(name: String): Unit
    def bind(exchange: String, bindingKey: String, queue: String): Unit
    /** Route one message; returns the queues it landed in. */
    def publish(exchange: String, routingKey: String, body: Array[Byte],
                headers: Map[String, String], contentType: String): Seq[String]
    def queueLength(queue: String): Long
    /** FIFO scan of a queue over [from, until) by delivery tag. */
    def fetch(queue: String, from: Long, until: Long): Iterator[Message]
  }

  /** In-process AMQP fake: exchanges route at publish time into
    * synchronized per-queue FIFO logs. JVM-wide registry so `local[*]`
    * executor threads share it, like [[Broker.InMemory]].
    */
  final class InMemory extends Transport {
    private val exchanges = TrieMap.empty[String, String] // name -> type
    private val bindings = TrieMap.empty[String, ArrayBuffer[(String, String)]]
    private val queues = TrieMap.empty[String, ArrayBuffer[Message]]

    def declareExchange(name: String, exchangeType: String): Unit = {
      require(Seq("direct", "fanout", "topic").contains(exchangeType),
        s"exchange type: $exchangeType")
      exchanges.putIfAbsent(name, exchangeType).foreach { existing =>
        // passive re-declaration must match (amqp_0_9.adoc: "if the
        // exchange already exists then the declaration passively
        // verifies that the settings match")
        require(existing == exchangeType,
          s"exchange $name already declared as $existing")
      }
    }

    def declareQueue(name: String): Unit = {
      queues.putIfAbsent(name, ArrayBuffer.empty)
      ()
    }

    def bind(exchange: String, bindingKey: String, queue: String): Unit = {
      require(exchanges.contains(exchange), s"unknown exchange: $exchange")
      require(queues.contains(queue), s"unknown queue: $queue")
      val b = bindings.getOrElseUpdate(exchange, ArrayBuffer.empty)
      b.synchronized { b += ((bindingKey, queue)); () }
    }

    def publish(exchange: String, routingKey: String, body: Array[Byte],
                headers: Map[String, String], contentType: String): Seq[String] = {
      val tpe = exchanges.getOrElse(exchange,
        throw new IllegalArgumentException(s"unknown exchange: $exchange"))
      val bound = bindings.getOrElse(exchange, ArrayBuffer.empty)
      val routes: String => Boolean = tpe match {
        case "fanout" => _ => true
        case "direct" => _ == routingKey
        case _        => topicMatches(_, routingKey)
      }
      val targets = bound.synchronized {
        bound.toVector.collect { case (bk, q) if routes(bk) => q }.distinct
      }
      targets.foreach { q =>
        val log = queues(q)
        log.synchronized {
          log += Message(body, exchange, routingKey, headers, contentType,
            deliveryTag = log.length.toLong + 1) // tags are 1-based
        }
      }
      targets
    }

    def queueLength(queue: String): Long = {
      val log = queues.getOrElse(queue,
        throw new IllegalArgumentException(s"unknown queue: $queue"))
      log.synchronized(log.length.toLong)
    }

    def fetch(queue: String, from: Long, until: Long): Iterator[Message] = {
      val log = queues.getOrElse(queue,
        throw new IllegalArgumentException(s"unknown queue: $queue"))
      log.synchronized(
        log.slice(from.toInt, math.min(until, log.length).toInt).toVector
      ).iterator
    }
  }

  object InMemory {
    private val registry = TrieMap.empty[String, InMemory]
    def named(name: String): InMemory =
      registry.getOrElseUpdate(name, new InMemory)
    def drop(name: String): Unit = { registry.remove(name); () }
  }

  def transportFor(address: String): Transport =
    if (address.startsWith("mem://")) InMemory.named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no AMQP transport for '$address' in this environment " +
        "(mem:// is the in-process fake; real brokers need an AMQP client)")

  /** RabbitMQ topic-exchange match: dot-separated words; `*` matches
    * exactly one word, `#` matches zero or more (public semantics from
    * the AMQP 0.9.1 spec / RabbitMQ tutorial five).
    */
  def topicMatches(pattern: String, key: String): Boolean = {
    val ps = pattern.split("\\.", -1)
    val ks = key.split("\\.", -1)
    // DP over (pattern idx, key idx): '#' absorbs any suffix length
    val memo = Array.fill(ps.length + 1, ks.length + 1)(-1)
    def go(i: Int, j: Int): Boolean = {
      if (memo(i)(j) >= 0) return memo(i)(j) == 1
      val r =
        if (i == ps.length) j == ks.length
        else ps(i) match {
          case "#" => go(i + 1, j) || (j < ks.length && go(i, j + 1))
          case "*" => j < ks.length && go(i + 1, j + 1)
          case w   => j < ks.length && w == ks(j) && go(i + 1, j + 1)
        }
      memo(i)(j) = if (r) 1 else 0
      r
    }
    go(0, 0)
  }

  /** Bounded read of one queue → the message envelope with the amqp_*
    * metadata surface (inputs/amqp_0_9.adoc Metadata). ONE queue = ONE
    * partition: AMQP consumption order is per-queue, and splitting a
    * queue across tasks would trade it away silently — parallelism
    * comes from reading many queues (union) like a real consumer
    * fleet.
    */
  def amqpRead(spark: SparkSession, address: String, queue: String,
               from: Long = 0L): DataFrame = {
    val until = transportFor(address).queueLength(queue)
    val rows = spark.sparkContext.parallelize(Seq((from, until)), 1)
      .flatMap { case (f, u) =>
        Mq.transportFor(address).fetch(queue, f, u).map { m =>
          val meta = Map(
            "amqp_exchange" -> m.exchange,
            "amqp_routing_key" -> m.routingKey,
            "amqp_delivery_tag" -> m.deliveryTag.toString,
            "amqp_redelivered" -> "false",
            "amqp_content_type" -> m.contentType,
            "amqp_consumer_tag" -> s"graft-$queue") ++ m.headers
          Row(new String(m.body, "UTF-8"), meta, null, m.deliveryTag - 1)
        }
      }
    spark.createDataFrame(rows, BrokerStream.schema)
  }

  /** Publish every row to `exchange` with its per-row routing key.
    * Routing happens executor-side against the shared topology — the
    * broker (not the producer) fans out to queues, so the write is a
    * narrow pass over the rows with no shuffle. Order within a task
    * follows `ordCol`; cross-task interleaving is exactly a competing-
    * producers broker's behavior.
    */
  def amqpWrite(df: DataFrame, address: String, exchange: String,
                keyCol: String, valueCol: String = "value",
                contentType: String = "application/octet-stream"): Unit = {
    val kIdx = df.schema.fieldIndex(keyCol)
    val vIdx = df.schema.fieldIndex(valueCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = Mq.transportFor(address)
      it.foreach { r =>
        val key = if (r.isNullAt(kIdx)) "" else r.getString(kIdx)
        val body = if (r.isNullAt(vIdx)) Array.empty[Byte]
          else r.getString(vIdx).getBytes("UTF-8")
        t.publish(exchange, key, body, Map.empty, contentType)
      }
    }
  }
}
