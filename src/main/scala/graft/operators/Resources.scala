package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resource management operators (SURVEY.md §2 #21: `resource`,
  * `rate_limit`, `cached`): the reference's named-resource registry,
  * request throttling, and result memoization — re-expressed so Catalyst
  * keeps the whole pipeline declarative.
  */
object Resources {

  /** `resource` (docs/…/components/pages/processors/resource.adoc:26):
    * named reusable pipeline segments. A registry of DataFrame
    * transforms; `ref` fails fast on unknown names like the reference's
    * config linter.
    */
  final class Registry {
    private val items =
      scala.collection.concurrent.TrieMap.empty[String, DataFrame => DataFrame]
    def register(name: String, f: DataFrame => DataFrame): Unit =
      items.put(name, f): Unit
    def ref(name: String): DataFrame => DataFrame =
      items.getOrElse(name,
        throw new IllegalArgumentException(s"unknown resource: $name"))
    def names: Seq[String] = items.keys.toSeq.sorted
  }

  /** `cached` (processors/cached.adoc:26): memoize an expensive
    * per-key computation. Relational form: compute ONCE per distinct
    * key, join results back — the shuffle dedups the work the
    * reference's cache would, but deterministically and at any scale.
    * `compute` receives the distinct keys as a single-column frame and
    * must return (key, result...) rows.
    */
  def cachedCompute(df: DataFrame, keyCol: String,
                    compute: DataFrame => DataFrame): DataFrame = {
    val results = compute(df.select(col(keyCol)).distinct())
    df.join(results, Seq(keyCol), "left_outer")
  }

  /** `rate_limit` (docs/…/components/pages/rate_limits/local.adoc:26):
    * in streaming, admission control belongs to the source — this
    * returns the reader options that bound ingest to ~`rowsPerSecond`
    * given the trigger interval. Batch jobs don't rate-limit (the
    * cluster scheduler owns throughput); for external-call operators use
    * the batch size of [[Embeddings.embedBatched]]/[[Ai.chatCompletion]]
    * plus partition count to cap in-flight requests.
    */
  def rateLimitOptions(rowsPerSecond: Long,
                       triggerIntervalSec: Long = 1): Map[String, String] =
    Map("maxRowsPerTrigger" -> (rowsPerSecond * triggerIntervalSec).toString,
      "maxFilesPerTrigger" -> "1")
}
