package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over Structured Streaming — the Spark form of the
  * reference's stateful pieces: `counter()`/`count(name)` (bloblang
  * functions), and the `cache` processor's add/get flow
  * (processors/cache.adoc:26, config/examples/joining_streams.yaml) —
  * state lives in the cluster-managed state store, scales with keys,
  * and survives across micro-batches/restarts via checkpointing.
  *
  * The operators work over the narrow (key, value, ts) message shape;
  * adapt wider frames by packing extra columns into `value` (JSON) —
  * the same envelope discipline the reference uses.
  */
object StatefulOps {

  case class Msg(key: String, value: String,
                 ts: java.sql.Timestamp)
  case class Counted(key: String, value: String, seq: Long)
  case class Hydrated(key: String, value: String, cached: String)

  private implicit val msgEnc = Encoders.product[Msg]
  private implicit val countedEnc = Encoders.product[Counted]
  private implicit val hydratedEnc = Encoders.product[Hydrated]
  private implicit val longEnc = Encoders.scalaLong
  private implicit val stringEnc = Encoders.STRING
  private implicit val optStringEnc = Encoders.product[CacheState]

  case class CacheState(first: String)

  /** Streaming `count(name)`: per-key monotonic sequence maintained in
    * keyed state across micro-batches. `ttl = Some(d)` bounds state via
    * a processing-time timeout (expired keys restart from 1) — NOTE
    * that registered timeouts make Spark schedule continuous empty
    * micro-batches under the default ASAP trigger, so pair a TTL with
    * an explicit `Trigger.ProcessingTime`; `ttl = None` keeps state
    * until the query ends (fine when key cardinality is bounded).
    */
  def runningCounter(df: DataFrame, ttl: Option[String] = None): Dataset[Counted] = {
    val timeout = if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    df.selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value", "CAST(ts AS TIMESTAMP) AS ts")
      .as[Msg]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, Counted](OutputMode.Append(), timeout) {
        case (key, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var n = state.getOption.getOrElse(0L)
            val out = rows.map { m => n += 1; Counted(key, m.value, n) }.toVector
            state.update(n)
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** Streaming `cache` add+get: the FIRST value seen for a key is
    * stored; every subsequent message on that key emits with the cached
    * value attached (the joining-streams hydration pattern where the
    * cache is fed by the same stream). First sighting emits with itself
    * as the cached value.
    */
  def firstValueCache(df: DataFrame, ttl: Option[String] = None): Dataset[Hydrated] = {
    val timeout = if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    df.selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value", "CAST(ts AS TIMESTAMP) AS ts")
      .as[Msg]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CacheState, Hydrated](OutputMode.Append(), timeout) {
        case (key, rows, state: GroupState[CacheState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cached = state.getOption.map(_.first)
            val out = rows.map { m =>
              if (cached.isEmpty) cached = Some(m.value)
              Hydrated(key, m.value, cached.get)
            }.toVector
            state.update(CacheState(cached.getOrElse("")))
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** The reference `cache` processor's add/get flow on the
    * `transformWithState` API (Spark 4 StatefulProcessor): the FIRST
    * value seen per key is stored in a ValueState with a NATIVE per-key
    * TTL — the state store expires entries itself, with no timer
    * registration (and so none of the continuous-empty-micro-batch
    * behavior that processing-time timeouts cause under the default
    * trigger; see [[firstValueCache]]). After expiry the next message
    * re-seeds the cache, matching the reference's TTL cache semantics
    * (docs/…/caches/memory.adoc default_ttl).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` →
    * `…state.RocksDBStateStoreProvider`) — the transformWithState
    * operator does not run on the default HDFS-backed store.
    */
  def ttlCache(df: DataFrame, ttl: java.time.Duration): Dataset[Hydrated] = {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    df.selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value", "CAST(ts AS TIMESTAMP) AS ts")
      .as[Msg]
      .groupByKey(_.key)
      .transformWithState[Hydrated](new TtlCacheProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  private class TtlCacheProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Msg, Hydrated] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    @transient private var first: org.apache.spark.sql.streaming.ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[String]("first", Encoders.STRING,
        TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[Msg],
                                 timers: TimerValues): Iterator[Hydrated] = {
      var cached = Option(first.get())
      val out = rows.map { m =>
        if (cached.isEmpty) {
          cached = Some(m.value)
          first.update(m.value) // seed (re-seed after expiry); TTL runs from the write
        }
        Hydrated(key, m.value, cached.get)
      }.toVector
      out.iterator
    }
  }

  /** Batch analogs (the oracle-checkable forms of the same semantics —
    * one window shuffle each).
    */
  def runningCounterBatch(df: DataFrame): DataFrame =
    df.withColumn("seq", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("ts"))).cast("long"))

  def firstValueCacheBatch(df: DataFrame): DataFrame =
    df.withColumn("cached", first(col("value")).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("ts"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
}
