package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Protocol contracts of the three queue adapters layered on the
  * CloudQueue state machines:
  *
  *   - NSQ (inputs/nsq.adoc:80-85): topic→channel fan-out, FIN (ack),
  *     REQ (requeue, optionally deferred), message-timeout redelivery
  *     with `nsq_attempts` incremented;
  *   - beanstalkd (internal/impl/beanstalkd/input.go:99-112): the put/
  *     reserve/delete/release/bury/kick/touch job lifecycle with
  *     priority-then-FIFO reservation and TTR expiry;
  *   - Azure Queue Storage (internal/impl/azure/
  *     input_queue_storage.go:130-180): pop-receipt acking, dequeue
  *     count on redelivery, queue-level user metadata stamped per
  *     message, and the message-lag arithmetic under track_properties.
  *
  * Expiry is driven by the injectable manual clock — no sleeps. The
  * config-runner wiring (input + output forms) is exercised at the
  * bottom.
  */
class QueueAdaptersSpec extends SparkSpec {

  private def fresh(p: String): String =
    p + "_" + java.util.UUID.randomUUID.toString.replace("-", "").take(12)

  // ───────────────────────────── NSQ ─────────────────────────────

  test("nsq: channels each receive a copy; a channel created later " +
       "starts empty") {
    val name = fresh("nsq")
    val t = Nsq.named(name)
    val addr = s"mem://$name"
    Nsq.createTopic(addr, "t")
    Nsq.createChannel(addr, "t", "c1")
    Nsq.publish(addr, "t", "m1".getBytes)
    Nsq.createChannel(addr, "t", "c2") // late channel: no replay
    Nsq.publish(addr, "t", "m2".getBytes)
    assert(t.pull("c1", 10, 60000L).map(d =>
      new String(d.message.body)).sorted == Seq("m1", "m2"))
    assert(t.pull("c2", 10, 60000L).map(d =>
      new String(d.message.body)) == Seq("m2"))
  }

  test("nsq: FIN removes; REQ redelivers immediately with attempts+1; " +
       "deferred REQ waits for the defer interval") {
    val name = fresh("nsq")
    val clock = new CloudQueue.Clock(0L)
    Nsq.named(name, clock)
    val addr = s"mem://$name"
    Nsq.createTopic(addr, "t")
    Nsq.createChannel(addr, "t", "ch")
    Nsq.publish(addr, "t", "a".getBytes)
    Nsq.publish(addr, "t", "b".getBytes)
    val t = Nsq.transportFor(addr)
    val d1 = t.pull("ch", 10, 60000L)
    assert(d1.size == 2 && d1.forall(_.deliveryAttempt == 1))
    // FIN a, REQ b (immediate)
    assert(Nsq.fin(addr, "ch", d1.head.ackId))
    assert(Nsq.req(addr, "ch", d1(1).ackId))
    val d2 = t.pull("ch", 10, 60000L)
    assert(d2.size == 1 && new String(d2.head.message.body) == "b")
    assert(d2.head.deliveryAttempt == 2, "REQ increments nsq_attempts")
    // deferred REQ: invisible until the defer elapses
    assert(Nsq.req(addr, "ch", d2.head.ackId, deferMs = 5000L))
    assert(t.pull("ch", 10, 60000L).isEmpty)
    clock.advance(5001L)
    val d3 = t.pull("ch", 10, 60000L)
    assert(d3.size == 1 && d3.head.deliveryAttempt == 3)
  }

  test("nsq: message timeout (no FIN in time) redelivers with " +
       "attempts incremented") {
    val name = fresh("nsq")
    val clock = new CloudQueue.Clock(0L)
    Nsq.named(name, clock)
    val addr = s"mem://$name"
    Nsq.createTopic(addr, "t")
    Nsq.createChannel(addr, "t", "ch")
    Nsq.publish(addr, "t", "m".getBytes)
    val t = Nsq.transportFor(addr)
    val d1 = t.pull("ch", 10, 1000L)
    assert(d1.size == 1)
    clock.advance(1001L)
    val d2 = t.pull("ch", 10, 1000L)
    assert(d2.size == 1 && d2.head.deliveryAttempt == 2)
    assert(!Nsq.fin(addr, "ch", d1.head.ackId),
      "a timed-out delivery's FIN is rejected (E_FIN_FAILED shape)")
    assert(Nsq.fin(addr, "ch", d2.head.ackId))
  }

  test("nsq: spark read drains a channel FIN-on-emit and surfaces the " +
       "nsq_* metadata") {
    val name = fresh("nsq")
    Nsq.named(name)
    val addr = s"mem://$name"
    Nsq.createTopic(addr, "t")
    Nsq.createChannel(addr, "t", "ch")
    (1 to 20).foreach(i => Nsq.publish(addr, "t", s"m$i".getBytes))
    val df = Nsq.read(spark, addr, "t", "ch", consumers = 4)
    val rows = df.select(col("value"),
      col("metadata")("nsq_attempts").as("att"),
      col("metadata")("nsq_nsqd_address").as("na"),
      col("metadata")("nsq_timestamp").cast("long").as("ts")).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      (1 to 20).map(i => s"m$i").sorted)
    assert(rows.forall(_.getString(1) == "1"))
    assert(rows.forall(_.getString(2) == name))
    assert(Nsq.transportFor(addr).backlog("ch") == 0,
      "FIN-on-emit drained the channel")
  }

  // ────────────────────────── beanstalkd ──────────────────────────

  test("beanstalkd: reserve hands out lowest-pri-then-FIFO; delayed " +
       "puts are invisible until the delay elapses") {
    val clock = new CloudQueue.Clock(0L)
    val t = Beanstalkd.named(fresh("bs"), clock)
    t.put("low".getBytes, pri = 2000)
    t.put("hi1".getBytes, pri = 10)
    t.put("hi2".getBytes, pri = 10)
    t.put("later".getBytes, pri = 0, delayMs = 5000L)
    // most urgent first; FIFO within equal pri; delayed invisible
    assert(new String(t.reserve().get.body) == "hi1")
    assert(new String(t.reserve().get.body) == "hi2")
    assert(new String(t.reserve().get.body) == "low")
    assert(t.reserve().isEmpty, "delayed job not yet ready")
    clock.advance(5001L)
    val j = t.reserve().get
    assert(new String(j.body) == "later",
      "pri 0 job becomes most urgent once its delay elapses")
  }

  test("beanstalkd: TTR expiry returns a reserved job to ready with " +
       "timeouts+1; touch restarts the TTR clock") {
    val clock = new CloudQueue.Clock(0L)
    val t = Beanstalkd.named(fresh("bs"), clock)
    t.put("j".getBytes)
    val j1 = t.reserve(ttrMs = 1000L).get
    assert(t.stats("reserved") == 1)
    clock.advance(1001L)
    assert(t.stats("ready") == 1, "TTR lapsed → back to ready")
    val j2 = t.reserve(ttrMs = 1000L).get
    assert(j2.timeouts == 1 && j2.reserves == 2)
    // touch keeps it reserved past the original deadline
    clock.advance(800L)
    assert(t.touch(j2.id, 1000L))
    clock.advance(800L)
    assert(t.stats("reserved") == 1, "touched job still held")
    assert(t.delete(j2.id))
    assert(j1.id == j2.id)
  }

  test("beanstalkd: release returns to ready (or delayed); bury parks " +
       "out of rotation until kick") {
    val clock = new CloudQueue.Clock(0L)
    val t = Beanstalkd.named(fresh("bs"), clock)
    t.put("a".getBytes)
    t.put("b".getBytes)
    // release with delay
    val ja = t.reserve().get
    assert(t.release(ja.id, pri = 500, delayMs = 3000L))
    assert(t.stats("delayed") == 1)
    // bury the other
    val jb = t.reserve().get
    assert(t.bury(jb.id, pri = 100))
    assert(t.stats("buried") == 1)
    assert(t.reserve().isEmpty, "nothing ready: one delayed, one buried")
    clock.advance(3001L)
    val ja2 = t.reserve().get
    assert(ja2.id == ja.id && ja2.releases == 1 && ja2.pri == 500,
      "released job comes back with its release pri")
    assert(t.release(ja2.id, 500, 0L))
    assert(t.kick(10) == 1)
    val kicked = t.reserve().get
    assert(kicked.id == jb.id && kicked.buries == 1 && kicked.pri == 100,
      "kick returns buried jobs to rotation at their bury pri " +
      "(100 beats 500)")
    // a non-reserved job cannot be released or buried
    assert(!t.release(kicked.id + 999, 1, 0L))
  }

  test("beanstalkd: spark read drains priority-then-FIFO with " +
       "delete-on-emit and the beanstalkd_* metadata") {
    val name = fresh("bs")
    val t = Beanstalkd.named(name)
    (1 to 9).foreach(i => t.put(s"m$i".getBytes, pri = i % 3))
    val df = Beanstalkd.read(spark, s"mem://$name", consumers = 1)
    val rows = df.select(col("value"), col("__seq"),
      col("metadata")("beanstalkd_priority").as("pri")).collect()
      .sortBy(_.getLong(1))
    assert(rows.length == 9)
    // emission order: pri 0 jobs (3,6,9) then pri 1 (1,4,7) then 2
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("m3", "m6", "m9", "m1", "m4", "m7", "m2", "m5", "m8"))
    assert(t.stats.values.sum == 0, "delete-on-emit drained the tube")
  }

  // ────────────────────── azure queue storage ──────────────────────

  test("azure: pop-receipt acks; expired lease redelivers with the " +
       "dequeue count incremented; stale pop-receipt is a no-op") {
    val name = fresh("az")
    val clock = new CloudQueue.Clock(0L)
    val t = AzureQueue.named(name, clock)
    t.createQueue("q")
    t.send("q", "m".getBytes)
    val d1 = t.receive("q", 10, 1000L)
    assert(d1.size == 1 && d1.head.receiveCount == 1)
    clock.advance(1001L)
    val d2 = t.receive("q", 10, 1000L)
    assert(d2.size == 1 && d2.head.receiveCount == 2,
      "DequeueCount increments on redelivery")
    assert(!t.delete("q", d1.head.receiptHandle),
      "pop-receipt from the previous dequeue is stale")
    assert(t.delete("q", d2.head.receiptHandle))
    assert(t.depth("q") == 0)
  }

  test("azure: track_properties surfaces per-batch message lag; queue " +
       "metadata and insertion time stamp every message") {
    val name = fresh("az")
    val addr = s"mem://$name"
    AzureQueue.named(name) // clock at 0 → constant insertion time
    AzureQueue.createQueue(addr, "q")
    AzureQueue.setQueueMetadata(addr, "q", Map("team" -> "ops"))
    (1 to 10).foreach(i => AzureQueue.enqueue(addr, "q", s"m$i".getBytes))
    val df = AzureQueue.read(spark, addr, "q", consumers = 1,
      batchSize = 4, trackProperties = true)
    val rows = df.select(col("value"),
      col("metadata")("queue_storage_message_lag").cast("long").as("lag"),
      col("metadata")("queue_storage_queue_name").as("qn"),
      col("metadata")("queue_storage_insertion_time").as("it"),
      col("metadata")("team").as("team"), col("__seq")).collect()
      .sortBy(_.getLong(5))
    assert(rows.length == 10)
    // batches of 4/4/2 against depths 10/6/2 → lag 6/2/0
    assert(rows.map(_.getLong(1)).toSeq ==
      Seq(6L, 6L, 6L, 6L, 2L, 2L, 2L, 2L, 0L, 0L))
    assert(rows.forall(_.getString(2) == "q"))
    assert(rows.forall(_.getString(3) == "1970-01-01T00:00:00Z"))
    assert(rows.forall(_.getString(4) == "ops"))
  }

  // ───────────────────── config-runner wiring ─────────────────────

  test("config: beanstalkd output → beanstalkd input round-trips " +
       "through the runner with per-row priority") {
    val name = fresh("bs")
    Beanstalkd.named(name)
    graft.config.Pipeline.run(spark,
      s"""
         |input:
         |  generate:
         |    count: 6
         |    mapping: 'root.id = this.seq'
         |pipeline:
         |  processors:
         |    - mapping: 'root = this'
         |output:
         |  beanstalkd:
         |    address: "mem://$name"
         |""".stripMargin)
    // runner output wrote 6 jobs; drain them back via the input form
    val back = graft.config.Pipeline.build(spark,
      s"""
         |input:
         |  beanstalkd:
         |    address: "mem://$name"
         |""".stripMargin)
    assert(back.count() == 6)
  }

  test("config: nsq and azure_queue_storage input forms compile and " +
       "drain the in-process transports") {
    val nq = fresh("nsq")
    Nsq.named(nq)
    Nsq.createTopic(s"mem://$nq", "t")
    Nsq.createChannel(s"mem://$nq", "t", "ch")
    (1 to 3).foreach(i => Nsq.publish(s"mem://$nq", "t", s"n$i".getBytes))
    val nsqDf = graft.config.Pipeline.build(spark,
      s"""
         |input:
         |  nsq:
         |    nsqd_tcp_addresses: ["mem://$nq"]
         |    topic: t
         |    channel: ch
         |""".stripMargin)
    assert(nsqDf.select("value").collect().map(_.getString(0)).sorted
      .toSeq == Seq("n1", "n2", "n3"))

    val az = fresh("az")
    AzureQueue.named(az)
    AzureQueue.createQueue(s"mem://$az", "jobs")
    (1 to 3).foreach(i =>
      AzureQueue.enqueue(s"mem://$az", "jobs", s"a$i".getBytes))
    val azDf = graft.config.Pipeline.build(spark,
      s"""
         |input:
         |  azure_queue_storage:
         |    storage_account: "mem://$az"
         |    queue_name: jobs
         |    track_properties: true
         |""".stripMargin)
    assert(azDf.select("value").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a1", "a2", "a3"))
  }
}
