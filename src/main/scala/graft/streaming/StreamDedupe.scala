package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The `dedupe` processor: drop a message if its key was seen within the
  * cache TTL (reference: docs/modules/components/pages/processors/
  * dedupe.adoc:26; golden test config/test/deduplicate.yaml:1-37 — TTL
  * cache `1m`, key `${! content() }`).
  *
  * Streaming: `dropDuplicatesWithinWatermark` — keyed state pruned by
  * the watermark, which IS the TTL cache with cluster-managed state
  * (scales to any key cardinality; state size tracks keys-per-TTL, not
  * stream length).
  *
  * Batch analog (used by the DuckDB oracle gate): keep a row iff the
  * previous occurrence of its key is absent or older than the TTL —
  * one window function over a single shuffle on the key.
  */
object StreamDedupe {

  /** Streaming TTL dedupe: `ts` must be the event-time column; `ttl`
    * doubles as the watermark delay. Exactly the deduplicate.yaml
    * semantics when keys repeat within the TTL.
    */
  def withinWatermark(df: DataFrame, ts: String, ttl: String,
                      keys: Seq[String]): DataFrame =
    df.withWatermark(ts, ttl).dropDuplicatesWithinWatermark(keys)

  /** Streaming exact dedupe over the full stream (unbounded state —
    * prefer [[withinWatermark]] at scale).
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Batch-mode TTL dedupe: drops rows whose SAME-KEY predecessor (by
    * event time, tie-broken by `ord`) lies within `ttlSeconds`. This is
    * the sequential-cache semantics of the reference processor applied
    * to a bounded corpus. NOTE: chains collapse from the KEPT message —
    * like a TTL cache that refreshes on every sighting, a row is dropped
    * iff ANY prior sighting within the TTL exists.
    */
  def ttlBatch(df: DataFrame, ts: Column, ord: Column, ttlSeconds: Long,
               keys: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ts, ord)
    df.withColumn("__prev_ts", lag(ts, 1).over(w))
      .filter(col("__prev_ts").isNull ||
        unix_micros(ts) - unix_micros(col("__prev_ts")) > ttlSeconds * 1000000L)
      .drop("__prev_ts")
  }
}
