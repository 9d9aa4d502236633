package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch-restructuring operators — the reference's "shuffle" surface
  * (SURVEY.md §2.3): archive/unarchive, split, select_parts,
  * bounds_check, group_by_value — re-expressed as declarative DataFrame
  * transforms so Catalyst plans the exchange instead of a per-batch loop.
  */
object BatchOps {

  /** `group_by_value` (processors/group_by_value.adoc:26): split a stream
    * into groups by key — the direct analog of relational GROUP BY.
    */
  def groupByValue(df: DataFrame, key: Column, aggs: Seq[Column]): DataFrame =
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)

  /** `archive` with `lines`-style folding (processors/archive.adoc:26):
    * fold each group's payloads into ONE row, concatenated by a
    * separator. Deterministic ordering by sorting payloads.
    * groupBy + collect_list runs as a partial (map-side) aggregation
    * before the shuffle.
    */
  def archiveLines(df: DataFrame, key: Column, payload: Column,
                   sep: String = "\n"): DataFrame =
    df.groupBy(key.as("key"))
      .agg(array_join(array_sort(collect_list(payload)), sep).as("archived"),
        count(lit(1)).as("n"))

  /** `unarchive` of a lines payload (processors/unarchive.adoc:26):
    * explode one message into many — a Catalyst Generator, fully
    * parallel, no driver involvement.
    */
  def unarchiveLines(df: DataFrame, payload: Column, sep: String = "\n"): DataFrame =
    df.withColumn("part", explode(split(payload, java.util.regex.Pattern.quote(sep))))

  /** `select_parts` (processors/select_parts.adoc:26): keep rows at the
    * given indexes within each batch (batch = partition key `batchKey`),
    * ordered by `ord`.
    */
  def selectParts(df: DataFrame, batchKey: Column, ord: Column,
                  indexes: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(batchKey).orderBy(ord)
    df.withColumn("batch_idx", row_number().over(w) - 1)
      .filter(col("batch_idx").isin(indexes: _*))
  }

  /** `bounds_check` (processors/bounds_check.adoc:26): drop rows whose
    * payload length falls outside [minLen, maxLen]. Pure filter —
    * pushed into the scan when the length is a stored column.
    */
  def boundsCheck(df: DataFrame, payload: Column,
                  minLen: Int, maxLen: Int): DataFrame =
    df.filter(length(payload).between(minLen, maxLen))

  /** `split` to size-N sub-batches (processors/split.adoc:26): assign a
    * sub-batch id per group of `n` rows within each batch.
    */
  def splitBatches(df: DataFrame, batchKey: Column, ord: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(batchKey).orderBy(ord)
    df.withColumn("sub_batch", floor((row_number().over(w) - 1) / n))
  }
}
