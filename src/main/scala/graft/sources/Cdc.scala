package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC ingestion (SURVEY.md §2.12 CDC row): the v1 path consumes
  * Debezium-format change envelopes — the wire shape every reference CDC
  * input family emits (postgres_cdc / mysql_cdc / mssql / oracledb;
  * typed-column contracts in internal/impl/postgresql/TYPES.md:26-45) —
  * from any message source (kafka, files), and applies them
  * relationally.
  *
  * Scale shape: parsing is a narrow map over the source scan;
  * [[latestState]] is ONE shuffle on the key with a rank-1 window —
  * the same plan whether the input is 1 GB or 100 TB of changelog, and
  * AQE handles hot keys. No per-row lookups, no driver state.
  */
object Cdc {

  /** Parse Debezium envelopes (`{"payload":{"before":…,"after":…,
    * "op":"c|u|d|r","ts_ms":…}}` or the unwrapped form) into typed
    * change rows: the `after` image as columns of `rowSchema` (DDL),
    * plus `__op` and `__ts_ms`. Delete events carry the `before` image
    * so the key survives for [[latestState]].
    */
  def debeziumOps(df: DataFrame, valueCol: String, rowSchema: String): DataFrame = {
    val payload = coalesce(
      get_json_object(col(valueCol), "$.payload"),
      col(valueCol))
    val op = coalesce(get_json_object(payload, "$.op"), lit("c"))
    val image = when(op === "d", get_json_object(payload, "$.before"))
      .otherwise(get_json_object(payload, "$.after"))
    df.select(
        from_json(image, lit(rowSchema)).as("r"),
        op.as("__op"),
        coalesce(get_json_object(payload, "$.ts_ms").cast("long"), lit(0L))
          .as("__ts_ms"))
      .select(col("r.*"), col("__op"), col("__ts_ms"))
  }

  /** Materialize the CURRENT state of a changelog: latest change per key
    * wins (ordered by `ord`, e.g. `__ts_ms` or an LSN column); a latest
    * `d` op removes the row. Snapshot reads (`r`) and inserts (`c`)
    * rank equally — Debezium semantics.
    */
  def latestState(ops: DataFrame, keyCols: Seq[String], ord: Column): DataFrame = {
    // explicit op rank for ties at equal ord: d > u > c/r (lexical desc
    // would rank u above d, letting a deleted row survive)
    val opRank = when(col("__op") === "d", 3)
      .when(col("__op") === "u", 2).otherwise(1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord.desc, opRank.desc)
    ops.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "d")
      .drop("__rn", "__op", "__ts_ms")
  }
}
