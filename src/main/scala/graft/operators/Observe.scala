package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Observability surface (SURVEY.md §2 #11/#70): the reference's
  * `metric`, `log`, `benchmark`, `crash` processors and its metrics/
  * tracer components, mapped onto Spark's native observation machinery
  * rather than per-message side effects.
  */
object Observe {

  /** `metric` (processors/metric.adoc:26): attach named aggregate
    * metrics to the flow WITHOUT changing it. Spark's `observe` computes
    * them inside the existing plan (no extra pass, no action); read the
    * values from the returned [[Observation]] after the query's action
    * completes.
    */
  def metric(df: DataFrame, name: String, exprs: Seq[Column]): (DataFrame, Observation) = {
    // observation ids must be unique WITHIN a plan (Spark rejects
    // duplicates) but the same metric NAME may be attached at several
    // points — e.g. a metric resource referenced from three workflow
    // branches (config/examples/track_benthos_downloads.yaml). The
    // disambiguating suffix is stripped when readings are reported.
    val obs = Observation(s"$name#${metricSeq.incrementAndGet()}")
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }

  private val metricSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Strip the per-plan disambiguating suffix from an observation id. */
  def metricName(obsId: String): String = obsId.replaceAll("#\\d+$", "")

  /** `benchmark` (processors/benchmark.adoc:26): rows + bytes + wall
    * seconds for one materialization of the frame.
    */
  def benchmark(df: DataFrame): (Long, Double) = {
    val t0 = System.nanoTime()
    val n = df.count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  /** `crash` (processors/crash.adoc:26): abort the query when any row
    * matches — Spark-side this is `raise_error` guarded by the
    * predicate, evaluated inline (fails the task, hence the job, on
    * first match — the reference's abort semantics).
    */
  def crashOn(df: DataFrame, pred: Column, message: String): DataFrame =
    // rides a FILTER, not a projected-then-dropped column: a dead
    // projection would be pruned by the optimizer, silently disarming
    // the check; a predicate always evaluates
    df.filter(when(pred,
      raise_error(concat(lit(s"crash: $message: "),
        to_json(struct(df.columns.map(col): _*)))).cast("boolean"))
      .otherwise(lit(true)))

  /** `log` (processors/log.adoc:26): sampled row logging as a
    * pass-through — logs at most one row per `every` within each
    * partition, on the executor's stderr (a per-message driver log
    * would serialize the pipeline).
    */
  def logSample(df: DataFrame, every: Long, prefix: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      var i = 0L
      it.map { r =>
        if (i % every == 0)
          // scalastyle:off println
          System.err.println(s"[$prefix] ${r.toString.take(500)}")
          // scalastyle:on println
        i += 1
        r
      }
    }
  }

  /** Tracer analog (reference tracers — jaeger/open_telemetry_collector,
    * docs/modules/components/pages/tracers/about.adoc: per-component
    * spans over message flow). Spark's unit of execution is the ACTION,
    * so a span here is one query execution: name (the action), wall
    * duration, and every `observe()` metric that ran inside the plan —
    * which is exactly where [[metric]] attaches per-stage counters, so
    * stage-level observability composes into the trace. Spans emit to
    * `sink` as JSON lines; production points that at a collector
    * exporter, tests read them directly.
    */
  def attachTracer(spark: SparkSession, sink: String => Unit)
      : org.apache.spark.sql.util.QueryExecutionListener = {
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      private def emit(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                       durationNs: Long, error: Option[String]): Unit = {
        val metrics = qe.observedMetrics.map { case (name, row) =>
          "\"" + metricName(name) + "\":" + row.json
        }.mkString("{", ",", "}")
        val err = error.map { e =>
          // JSON-escape via Jackson — backslashes, newlines, and
          // control characters must survive as a valid span line
          val quoted = new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(e.take(200))
          s""","error":$quoted"""
        }.getOrElse("")
        sink(s"""{"span":"$funcName","duration_ms":${durationNs / 1000000}""" +
          s""","observed":$metrics$err}""")
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = emit(funcName, qe, durationNs, None)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit =
        emit(funcName, qe, 0L, Some(String.valueOf(error.getMessage)))
    }
    spark.listenerManager.register(l)
    l
  }

  /** Streaming metrics: forward every progress event (rows/sec, batch
    * durations, watermark) to `sink` — the Spark analog of the
    * reference's metrics components (docs/modules/components/pages/
    * metrics/about.adoc:26).
    */
  def attachStreamingMetrics(spark: SparkSession,
                             sink: String => Unit): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        sink(s"""{"event":"started","id":"${e.id}","name":"${Option(e.name).getOrElse("")}"}""")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        sink(e.progress.json)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        sink(s"""{"event":"terminated","id":"${e.id}"}""")
    }
    spark.streams.addListener(l)
    l
  }
}
