package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `system_window` buffer semantics on Structured Streaming
  * (reference: docs/modules/components/pages/buffers/system_window.adoc):
  *
  *   - tumbling / sliding windows of fixed temporal size
  *     (system_window.adoc:26-51) → `window(ts, size[, slide])`
  *   - event-time vs processing-time via `timestamp_mapping`
  *     (system_window.adoc:130-146) → caller names the event-time
  *     column (project `current_timestamp()` first for processing time)
  *   - `allowed_lateness` delays flush (system_window.adoc:45,199) →
  *     `withWatermark(ts, lateness)` — same observable behavior: a
  *     message later than the watermark is dropped
  *   - `window_end_timestamp` metadata (system_window.adoc:47) →
  *     `window_end` column (RFC3339 via [[rfc3339]])
  *
  * Intentional divergence (documented in SURVEY.md §2.6): backpressure
  * window-shedding (system_window.adoc:53-57) is NOT replicated — Spark
  * buffers windows in the state store and delivers exactly once
  * (a strengthening of the reference's at-least-once + shedding).
  *
  * Every helper works identically on BATCH DataFrames — the reference
  * itself treats a terminating input as a batch job; this is also how
  * the DuckDB oracle checks these operators (q12/q13 queries).
  */
object Windows {

  /** RFC3339 rendering of a timestamp column (UTC session). */
  def rfc3339(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ssXXX")

  /** Tumbling window aggregation over event-time column `ts`.
    * `lateness` = allowed_lateness; None in batch mode (no watermark).
    */
  def tumbling(df: DataFrame, ts: String, size: String,
               lateness: Option[String], groupCols: Seq[Column],
               aggs: Seq[Column]): DataFrame = {
    val wm = lateness.map(l => df.withWatermark(ts, l)).getOrElse(df)
    wm.groupBy((window(col(ts), size) +: groupCols): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Sliding window aggregation (slide < size ⇒ messages belong to
    * multiple windows, system_window.adoc:49-51).
    */
  def sliding(df: DataFrame, ts: String, size: String, slide: String,
              lateness: Option[String], groupCols: Seq[Column],
              aggs: Seq[Column]): DataFrame = {
    val wm = lateness.map(l => df.withWatermark(ts, l)).getOrElse(df)
    wm.groupBy((window(col(ts), size, slide) +: groupCols): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** The system_window BUFFER form (buffers/system_window.adoc):
    * assign each MESSAGE to its window(s) rather than aggregating —
    * the window becomes the batch identity (`__batch` = window end,
    * epoch ms) so downstream batch-scoped processors (group_by_value,
    * from_all, select_parts…) operate per window, and every message
    * gains `window_end_timestamp` metadata (RFC3339, the adoc
    * contract). With `slideMs` < `sizeMs` messages belong to multiple
    * windows and duplicate into each (adoc sliding-windows section).
    *
    * Pure projection + explode — no shuffle; the window id shuffles
    * only when a downstream op groups on it.
    */
  def assignWindows(df: DataFrame, tsCol: Column, sizeMs: Long,
                    slideMs: Long = 0L, offsetMs: Long = 0L,
                    metadataCol: Option[String] = None): DataFrame = {
    require(sizeMs > 0, "system_window needs a positive size")
    val step = if (slideMs > 0) slideMs else sizeMs
    val tsMs = (tsCol.cast("double") * 1000).cast("long")
    val kMax = floor((tsMs - lit(offsetMs)).cast("double") / lit(step))
      .cast("long")
    val kMin =
      if (slideMs > 0 && slideMs < sizeMs)
        floor((tsMs - lit(offsetMs) - lit(sizeMs)).cast("double") / lit(step))
          .cast("long") + 1
      else kMax
    val exploded = df
      .withColumn("__wk", explode(sequence(kMin, kMax)))
      .withColumn("__batch", col("__wk") * step + offsetMs + sizeMs)
      .drop("__wk")
    val endTs = rfc3339(timestamp_millis(col("__batch")))
    metadataCol match {
      case Some(m) =>
        exploded.withColumn(m, map_concat(
          map_filter(col(m), (k, _) => k =!= "window_end_timestamp"),
          map(lit("window_end_timestamp"), endTs)))
      case None =>
        exploded.withColumn("metadata",
          map(lit("window_end_timestamp"), endTs))
    }
  }

  /** Session windows (gap-based) — absent in the reference
    * (SURVEY.md §2.6 "free capability"), first-class in Spark.
    */
  def session(df: DataFrame, ts: String, gap: String,
              lateness: Option[String], groupCols: Seq[Column],
              aggs: Seq[Column]): DataFrame = {
    val wm = lateness.map(l => df.withWatermark(ts, l)).getOrElse(df)
    wm.groupBy((session_window(col(ts), gap) +: groupCols): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("session_window.start"))
      .withColumn("window_end", col("session_window.end"))
      .drop("session_window")
  }

  /** The traffic-light example (system_window.adoc:85-127): tumbling
    * event-time windows keyed by light; total_cars = distinct plates,
    * passengers = sum. Streaming and batch produce identical results.
    */
  def trafficLightSummary(df: DataFrame, size: String,
                          lateness: Option[String]): DataFrame =
    tumbling(df, "created_at", size, lateness,
      Seq(col("traffic_light")),
      Seq(
        // exact in-window distinct (unique().length(), adoc:121) —
        // size(collect_set) because COUNT(DISTINCT) is unsupported in
        // streaming aggs; state is bounded by distinct plates per
        // window. At 100 TB swap for approx_count_distinct and document
        // the error bound.
        org.apache.spark.sql.functions.size(collect_set(col("registration_plate"))).cast("long").as("total_cars"),
        sum(col("passengers")).as("passengers")))
      .select(col("traffic_light"), rfc3339(col("window_end")).as("created_at"),
        col("total_cars"), col("passengers"))
}
