package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flow-control / error-channel operators (SURVEY.md §2.2).
  *
  * The reference treats processor failures as DATA: a failed message
  * carries an error flag and keeps flowing; `try`/`catch`/
  * `reject_errored` route on it (processors/try.adoc:26, catch.adoc:26).
  * We adopt the same discipline: an `error: string` column (null =
  * healthy), never exceptions in executors — a single poisoned record
  * must not kill a 1000-executor job.
  */
object FlowControl {

  val ErrorCol = "error"

  /** Ensure the error column exists (null = healthy). */
  def withErrorChannel(df: DataFrame): DataFrame =
    if (df.columns.contains(ErrorCol)) df
    else df.withColumn(ErrorCol, lit(null).cast("string"))

  /** `switch` (processors/switch.adoc:26): first matching case labels the
    * row. Compiles to one CASE WHEN chain — no branch materialization.
    */
  def switch(cases: Seq[(Column, Column)], default: Column): Column =
    cases.foldRight(default) { case ((pred, out), els) =>
      when(pred, out).otherwise(els)
    }

  /** `try`-style guarded computation: applies `attempt`; rows where
    * `failed` holds get the error set and a null result; healthy rows
    * keep error = null. Mirrors try.adoc:26 + catch.adoc:26 without
    * splitting/unioning the plan.
    */
  def tryColumn(df: DataFrame, outCol: String, attempt: Column,
                failed: Column, errMsg: Column): DataFrame = {
    val d = withErrorChannel(df)
    d.withColumn(outCol, when(failed, lit(null)).otherwise(attempt))
      .withColumn(ErrorCol,
        when(col(ErrorCol).isNotNull, col(ErrorCol))
          .otherwise(when(failed, errMsg)))
  }

  /** `catch` (catch.adoc:26): apply recovery to errored rows only, then
    * clear the error flag.
    */
  def catchErrors(df: DataFrame, recover: DataFrame => DataFrame): DataFrame = {
    val d = withErrorChannel(df)
    val ok = d.filter(col(ErrorCol).isNull)
    val bad = recover(d.filter(col(ErrorCol).isNotNull))
      .withColumn(ErrorCol, lit(null).cast("string"))
    ok.unionByName(bad)
  }

  /** `reject_errored` (outputs/reject_errored.adoc:26): split healthy
    * from errored.
    */
  def rejectErrored(df: DataFrame): (DataFrame, DataFrame) = {
    val d = withErrorChannel(df)
    (d.filter(col(ErrorCol).isNull), d.filter(col(ErrorCol).isNotNull))
  }

  /** `branch` (processors/branch.adoc:26): request_map → child transform →
    * result_map merged back. When the child is expressible column-wise it
    * is a plain withColumns; a genuinely relational child (external join)
    * re-joins on a row id supplied by the caller.
    */
  def branch(df: DataFrame, requestCols: Seq[Column], idCol: Column,
             child: DataFrame => DataFrame): DataFrame = {
    val req = df.select((idCol.as("__branch_id") +: requestCols): _*)
    val res = child(req)
    df.join(res, idCol === col("__branch_id"), "left").drop("__branch_id")
  }
}
