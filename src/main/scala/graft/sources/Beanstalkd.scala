package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Beanstalkd-shaped work-queue transport (inputs/beanstalkd.adoc,
  * outputs/beanstalkd.adoc; internal/impl/beanstalkd/input.go:99-112 —
  * the reference consumer is reserve → Delete on ack / Release(pri 2,
  * 200ms) on nack). The protocol's public job lifecycle:
  *
  *   - `put <pri> <delay> <ttr>`: lower `pri` is more urgent; a
  *     delayed job is invisible until the delay elapses;
  *   - `reserve` hands out the most urgent READY job (priority, then
  *     FIFO) and starts its TTR clock — a job not deleted, released,
  *     buried, or touched within TTR returns to READY (`timeouts`+1);
  *   - `release <pri> <delay>` returns a reserved job to READY (or
  *     DELAYED), `bury` parks it out of rotation until `kick`,
  *     `touch` restarts TTR, `delete` removes;
  *   - one tube per queue (this transport's name = the tube; the
  *     reference input watches a single tube).
  *
  * Time is the injectable [[CloudQueue.Clock]] so TTR/delay expiry is
  * spec-driven. The read is a bounded competing-consumer drain with
  * delete-on-emit (the input.go ack shape).
  */
object Beanstalkd {

  final case class Job(id: Long, pri: Int, body: Array[Byte],
                       reserves: Int, timeouts: Int, releases: Int,
                       buries: Int)

  final class Tube(val clock: CloudQueue.Clock = new CloudQueue.Clock) {
    private case class J(id: Long, var pri: Int, body: Array[Byte],
                         var state: String, // ready|delayed|reserved|buried
                         var readyAt: Long,    // delayed → ready time
                         var deadline: Long,   // reserved → TTR expiry
                         var seq: Long,        // FIFO tiebreak within pri
                         var reserves: Int, var timeouts: Int,
                         var releases: Int, var buries: Int)
    private val jobs = mutable.LinkedHashMap.empty[Long, J]
    private val idGen = new AtomicLong(0)

    private def expireLocked(now: Long): Unit =
      jobs.values.foreach { j =>
        if (j.state == "reserved" && j.deadline <= now) {
          j.state = "ready"; j.timeouts += 1
        }
        if (j.state == "delayed" && j.readyAt <= now) j.state = "ready"
      }

    def put(body: Array[Byte], pri: Int = 1024, delayMs: Long = 0L,
            ttrMs: Long = 60000L): Long = synchronized {
      val now = clock.nowMs
      val id = idGen.incrementAndGet()
      jobs(id) = J(id, pri, body,
        if (delayMs > 0) "delayed" else "ready",
        readyAt = now + delayMs, deadline = 0L, seq = id,
        reserves = 0, timeouts = 0, releases = 0, buries = 0)
      id
    }

    /** Most urgent ready job: lowest pri, then FIFO. None = drained. */
    def reserve(ttrMs: Long = 60000L): Option[Job] = synchronized {
      val now = clock.nowMs
      expireLocked(now)
      val ready = jobs.values.filter(_.state == "ready")
      if (ready.isEmpty) None
      else {
        val j = ready.minBy(x => (x.pri, x.seq))
        j.state = "reserved"; j.deadline = now + ttrMs; j.reserves += 1
        Some(Job(j.id, j.pri, j.body, j.reserves, j.timeouts,
          j.releases, j.buries))
      }
    }

    def delete(id: Long): Boolean = synchronized {
      jobs.remove(id).isDefined
    }

    def release(id: Long, pri: Int, delayMs: Long): Boolean = synchronized {
      jobs.get(id).filter(_.state == "reserved") match {
        case Some(j) =>
          j.pri = pri; j.releases += 1
          if (delayMs > 0) { j.state = "delayed"; j.readyAt = clock.nowMs + delayMs }
          else j.state = "ready"
          true
        case None => false
      }
    }

    def bury(id: Long, pri: Int): Boolean = synchronized {
      jobs.get(id).filter(_.state == "reserved") match {
        case Some(j) => j.pri = pri; j.state = "buried"; j.buries += 1; true
        case None => false
      }
    }

    /** Up to n buried jobs back to ready; returns the count kicked. */
    def kick(n: Int): Int = synchronized {
      val buried = jobs.values.filter(_.state == "buried")
        .toSeq.sortBy(_.seq).take(n)
      buried.foreach(_.state = "ready")
      buried.size
    }

    def touch(id: Long, ttrMs: Long): Boolean = synchronized {
      jobs.get(id).filter(_.state == "reserved") match {
        case Some(j) => j.deadline = clock.nowMs + ttrMs; true
        case None => false
      }
    }

    def stats: Map[String, Int] = synchronized {
      val now = clock.nowMs
      expireLocked(now)
      Map(
        "ready" -> jobs.values.count(_.state == "ready"),
        "reserved" -> jobs.values.count(_.state == "reserved"),
        "delayed" -> jobs.values.count(_.state == "delayed"),
        "buried" -> jobs.values.count(_.state == "buried"))
    }
  }

  private val registry = TrieMap.empty[String, Tube]
  def named(name: String): Tube = registry.getOrElseUpdate(name, new Tube)
  def named(name: String, clock: CloudQueue.Clock): Tube =
    registry.getOrElseUpdate(name, new Tube(clock))
  def drop(name: String): Unit = { registry.remove(name); () }

  def tubeFor(address: String): Tube =
    if (address.startsWith("mem://")) named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no beanstalkd transport for '$address' in this environment " +
        "(mem:// is the in-process fake; a real server needs its client)")

  /** Bounded drain: competing consumers reserve → emit → delete (the
    * input.go ack path). Reservation order across competing consumers
    * follows priority-then-FIFO per reserve call; the destructive
    * read is pinned with an eager localCheckpoint (see
    * [[CloudQueue.sqsRead]]).
    */
  def read(spark: SparkSession, address: String, consumers: Int = 4,
           ttrMs: Long = 60000L): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(0 until consumers, consumers)
      .flatMap { c =>
        val t = Beanstalkd.tubeFor(address)
        Iterator.continually(t.reserve(ttrMs))
          .takeWhile(_.isDefined).map(_.get)
          .zipWithIndex.map { case (j, i) =>
            t.delete(j.id)
            val meta = Map(
              "beanstalkd_job_id" -> j.id.toString,
              "beanstalkd_priority" -> j.pri.toString,
              "beanstalkd_reserves" -> j.reserves.toString,
              "beanstalkd_timeouts" -> j.timeouts.toString)
            Row(new String(j.body, "UTF-8"), meta, null,
              (c.toLong << 40) | i.toLong)
          }
      }
    spark.createDataFrame(rows, BrokerStream.schema).localCheckpoint()
  }

  /** Put every row; per-row priority from an optional column. */
  def write(df: DataFrame, address: String, valueCol: String = "value",
            priCol: Option[String] = None, delayMs: Long = 0L,
            ttrMs: Long = 60000L): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    val pIdx = priCol.map(df.schema.fieldIndex)
    df.foreachPartition { (it: Iterator[Row]) =>
      val t = Beanstalkd.tubeFor(address)
      it.foreach { r =>
        val pri = pIdx.filterNot(r.isNullAt)
          .map(i => r.get(i).toString.toInt).getOrElse(1024)
        t.put(r.getString(vIdx).getBytes("UTF-8"), pri, delayMs, ttrMs)
        ()
      }
    }
  }
}
