package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cloud-queue delivery contracts through the [[CloudQueue]] seam:
  * SQS visibility-timeout leasing / receipt handles / FIFO group +
  * dedup semantics (inputs/aws_sqs.adoc, outputs/aws_sqs.adoc) and
  * Pub/Sub subscription fan-out / ack deadlines / ordering keys
  * (inputs/gcp_pubsub.adoc, outputs/gcp_pubsub.adoc). Lease expiry is
  * driven by the injectable manual clock — no sleeps.
  */
class CloudQueueSpec extends SparkSpec {

  private def fresh(p: String): String =
    p + "_" + java.util.UUID.randomUUID.toString.replace("-", "").take(12)

  // ───────────────────────────── SQS ─────────────────────────────

  test("sqs: visibility timeout leases; expiry redelivers with fresh " +
       "handle and incremented receive count") {
    val clock = new CloudQueue.Clock(1000L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q")
    t.send("q", "m1".getBytes, Map("k" -> "v"))
    val d1 = t.receive("q", 10, visibilityTimeoutMs = 5000L)
    assert(d1.size == 1 && d1.head.receiveCount == 1)
    // leased: a second receive inside the window sees nothing
    assert(t.receive("q", 10, 5000L).isEmpty)
    clock.advance(5001L)
    val d2 = t.receive("q", 10, 5000L)
    assert(d2.size == 1, "expired lease redelivers")
    assert(d2.head.receiveCount == 2)
    assert(d2.head.receiptHandle != d1.head.receiptHandle,
      "each delivery issues a fresh receipt handle")
    assert(d2.head.message.messageId == d1.head.message.messageId)
  }

  test("sqs: delete acks by current handle only; stale handle is a no-op") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q")
    t.send("q", "m".getBytes)
    val d1 = t.receive("q", 10, 1000L)
    clock.advance(2000L) // lease expires
    val d2 = t.receive("q", 10, 1000L)
    assert(!t.delete("q", d1.head.receiptHandle),
      "stale receipt handle does not delete (AWS semantics)")
    assert(t.depth("q") == 1)
    assert(t.delete("q", d2.head.receiptHandle))
    assert(t.depth("q") == 0)
  }

  test("sqs: delete by the LATEST handle succeeds even after the " +
       "visibility timeout lapses (invalidated only on re-receive)") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q")
    t.send("q", "m".getBytes)
    val d1 = t.receive("q", 10, 1000L)
    clock.advance(2000L) // lease expired, but nobody re-received
    assert(t.delete("q", d1.head.receiptHandle),
      "AWS accepts DeleteMessage with the most recent receipt handle " +
      "after expiry, until a redelivery issues a new one")
    assert(t.depth("q") == 0)
    assert(t.receive("q", 10, 1000L).isEmpty, "no ghost redelivery")
  }

  test("sqs: reset_visibility (nack) makes the message immediately " +
       "deliverable again") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q")
    t.send("q", "m".getBytes)
    val d = t.receive("q", 10, 60000L)
    assert(t.receive("q", 10, 60000L).isEmpty)
    t.changeVisibility("q", d.head.receiptHandle, 0L)
    val again = t.receive("q", 10, 60000L)
    assert(again.size == 1 && again.head.receiveCount == 2)
  }

  test("sqs fifo: message_group_id serializes per group; other groups " +
       "deliver concurrently") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q", fifo = true)
    t.send("q", "a1".getBytes, groupId = Some("A"), dedupId = Some("a1"))
    t.send("q", "a2".getBytes, groupId = Some("A"), dedupId = Some("a2"))
    t.send("q", "b1".getBytes, groupId = Some("B"), dedupId = Some("b1"))
    val d1 = t.receive("q", 10, 30000L)
    // one per group: a2 is blocked behind a1
    assert(d1.map(x => new String(x.message.body)).sorted == Seq("a1", "b1"))
    // group A stays blocked while a1 is in flight
    assert(t.receive("q", 10, 30000L).isEmpty)
    d1.foreach(x => t.delete("q", x.receiptHandle))
    val d2 = t.receive("q", 10, 30000L)
    assert(d2.map(x => new String(x.message.body)) == Seq("a2"))
  }

  test("sqs fifo: message_deduplication_id drops re-sends within the " +
       "window, accepts after it") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q", fifo = true)
    assert(t.send("q", "m".getBytes, groupId = Some("g"),
      dedupId = Some("d1")).nonEmpty)
    assert(t.send("q", "m-again".getBytes, groupId = Some("g"),
      dedupId = Some("d1")).isEmpty, "re-send inside the window dropped")
    assert(t.depth("q") == 1)
    clock.advance(5 * 60 * 1000L + 1)
    assert(t.send("q", "m-later".getBytes, groupId = Some("g"),
      dedupId = Some("d1")).nonEmpty, "window expired: accepted")
  }

  test("sqs: delayed send is invisible until the delay elapses") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.sqsNamed(fresh("sqs"), clock)
    t.createQueue("q")
    t.send("q", "late".getBytes, delayMs = 10000L)
    assert(t.receive("q", 10, 1000L).isEmpty)
    clock.advance(10000L)
    assert(t.receive("q", 10, 1000L).size == 1)
  }

  test("sqs: spark roundtrip surfaces sqs_* metadata and attributes; " +
       "read drains and deletes") {
    import spark.implicits._
    val name = fresh("sqs")
    val t = CloudQueue.sqsNamed(name)
    t.createQueue("q")
    val df = (1 to 100).map(i => (s"""{"i":$i}""", s"attr$i"))
      .toDF("value", "source")
    CloudQueue.sqsWrite(df, s"mem://$name", "q",
      attributeCols = Seq("source"))
    assert(t.depth("q") == 100)
    val got = CloudQueue.sqsRead(spark, s"mem://$name", "q", consumers = 3)
    val rows = got.select(
      get_json_object(col("value"), "$.i").cast("int").as("i"),
      col("metadata")("sqs_message_id").as("mid"),
      col("metadata")("sqs_approximate_receive_count").as("rc"),
      col("metadata")("source").as("src")).collect()
    assert(rows.length == 100)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 100))
    assert(rows.forall(r => r.getString(1).startsWith("sqs-")))
    assert(rows.forall(_.getString(2) == "1"))
    assert(rows.forall(r => r.getString(3) == s"attr${r.getInt(0)}"))
    assert(t.depth("q") == 0, "delete_message drained the queue")
  }

  // ──────────────────────────── Pub/Sub ───────────────────────────

  test("pubsub: a subscription sees only messages published while it " +
       "exists; two subscriptions each get every message") {
    val t = CloudQueue.psNamed(fresh("ps"))
    t.createTopic("t")
    t.publish("t", "before".getBytes)
    t.subscribe("t", "s1")
    t.publish("t", "m1".getBytes)
    t.subscribe("t", "s2")
    t.publish("t", "m2".getBytes)
    def drain(s: String) =
      t.pull(s, 100, 60000L).map(d => new String(d.message.body))
    assert(drain("s1") == Seq("m1", "m2"), "no replay of 'before'")
    assert(drain("s2") == Seq("m2"))
  }

  test("pubsub: ack deadline expiry redelivers with delivery_attempt " +
       "incremented; ack removes; nack redelivers immediately") {
    val clock = new CloudQueue.Clock(0L)
    val t = CloudQueue.psNamed(fresh("ps"), clock)
    t.createTopic("t"); t.subscribe("t", "s")
    t.publish("t", "a".getBytes); t.publish("t", "b".getBytes)
    val d1 = t.pull("s", 10, ackDeadlineMs = 5000L)
    assert(d1.size == 2 && d1.forall(_.deliveryAttempt == 1))
    t.ack("s", d1.head.ackId) // ack "a"
    clock.advance(5001L)      // "b"'s deadline expires
    val d2 = t.pull("s", 10, 5000L)
    assert(d2.map(x => new String(x.message.body)) == Seq("b"))
    assert(d2.head.deliveryAttempt == 2)
    t.modifyAckDeadline("s", d2.head.ackId, 0L) // nack
    val d3 = t.pull("s", 10, 5000L)
    assert(d3.size == 1 && d3.head.deliveryAttempt == 3)
    t.ack("s", d3.head.ackId)
    assert(t.backlog("s") == 0)
  }

  test("pubsub: ordering key serializes delivery per key") {
    val t = CloudQueue.psNamed(fresh("ps"))
    t.createTopic("t"); t.subscribe("t", "s")
    t.publish("t", "k1-a".getBytes, orderingKey = "k1")
    t.publish("t", "k1-b".getBytes, orderingKey = "k1")
    t.publish("t", "k2-a".getBytes, orderingKey = "k2")
    t.publish("t", "free".getBytes)
    val d1 = t.pull("s", 10, 60000L)
    assert(d1.map(x => new String(x.message.body)).sorted ==
      Seq("free", "k1-a", "k2-a"), "k1-b blocked behind outstanding k1-a")
    d1.foreach(x => t.ack("s", x.ackId))
    val d2 = t.pull("s", 10, 60000L)
    assert(d2.map(x => new String(x.message.body)) == Seq("k1-b"))
  }

  test("pubsub: spark roundtrip surfaces gcp_pubsub_* metadata") {
    import spark.implicits._
    val name = fresh("ps")
    val t = CloudQueue.psNamed(name)
    t.createTopic("t"); t.subscribe("t", "s")
    val df = (1 to 60).map(i => (s"""{"i":$i}""", s"u${i % 5}"))
      .toDF("value", "okey")
    CloudQueue.pubsubWrite(df, s"mem://$name", "t",
      orderingKeyCol = Some("okey"))
    val got = CloudQueue.pubsubRead(spark, s"mem://$name", "s",
      consumers = 3)
    val rows = got.select(
      get_json_object(col("value"), "$.i").cast("int").as("i"),
      col("metadata")("gcp_pubsub_message_id").as("mid"),
      col("metadata")("gcp_pubsub_ordering_key").as("ok"),
      col("metadata")("gcp_pubsub_delivery_attempt").as("da")).collect()
    assert(rows.length == 60)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 60))
    assert(rows.forall(r => r.getString(2) == s"u${r.getInt(0) % 5}"))
    assert(rows.forall(_.getString(3) == "1"))
    assert(t.backlog("s") == 0)
  }
}
