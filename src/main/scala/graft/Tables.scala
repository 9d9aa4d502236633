package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-provided star schema (TESTDATA.md).
  *
  * All readers go through `spark.read.parquet` so Catalyst gets native
  * column pruning + predicate pushdown into the scan (check
  * `PushedFilters`/`ReadSchema` in `.explain("formatted")`). At 100 TB the
  * same call works against a partitioned table path; nothing here assumes
  * single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings required to read the driver-generated parquet:
    * `events.ts` is TIMESTAMP(NANOS) which Spark 4 only reads as a long
    * (converted back to a timestamp in [[events]]), and NTZ inference is
    * disabled so all timestamps surface as session-TZ (UTC) instants —
    * the same values DuckDB sees.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    configure(spark).read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `ts` has shipped as both TIMESTAMP(NANOS) (surfacing as a long
    * under `nanosAsLong` — µs-aligned, so the integer division to
    * TimestampType is lossless) and native TIMESTAMP(MICROS) (already a
    * TimestampType). Branch on the loaded type so both generations of
    * the driver-written parquet read identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
