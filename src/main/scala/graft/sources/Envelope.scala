package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The canonical message envelope (SURVEY.md §1.3): every dynamic-schema
  * source presents rows as
  * `value: string (raw payload), metadata: map<string,string>,
  * error: string (null = healthy)`; schema-known sources (parquet, CSV
  * with header types, JDBC) present typed columns instead and only wrap
  * on demand.
  *
  * Reference: a message = payload bytes + metadata + error flag
  * (docs/modules/configuration/pages/unit_testing.adoc:65, bloblang
  * functions `content`/`metadata`/`error`).
  */
object Envelope {

  val ValueCol = "value"
  val MetadataCol = "metadata"
  val ErrorCol = "error"

  /** Wrap a typed DataFrame into the envelope: value = JSON of all
    * columns, empty metadata, healthy error.
    */
  def wrap(df: DataFrame, metadata: Map[String, Column] = Map.empty): DataFrame = {
    val meta =
      if (metadata.isEmpty) map().cast("map<string,string>")
      else map_concat(metadata.toSeq.map { case (k, v) =>
        map(lit(k), v.cast("string")) }: _*)
    df.select(
      to_json(struct(df.columns.map(col): _*)).as(ValueCol),
      meta.as(MetadataCol),
      lit(null).cast("string").as(ErrorCol))
  }

  /** Unwrap an envelope into typed columns via from_json + schema. */
  def unwrap(df: DataFrame, ddlSchema: String): DataFrame =
    df.select(from_json(col(ValueCol), ddlSchema,
      Map.empty[String, String]).as("r"), col(MetadataCol), col(ErrorCol))
      .select("r.*", MetadataCol, ErrorCol)

  /** Ensure envelope columns exist on a value-only frame. */
  def ensure(df: DataFrame): DataFrame = {
    val withMeta =
      if (df.columns.contains(MetadataCol)) df
      else df.withColumn(MetadataCol, map().cast("map<string,string>"))
    if (withMeta.columns.contains(ErrorCol)) withMeta
    else withMeta.withColumn(ErrorCol, lit(null).cast("string"))
  }
}
