package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blobl.Blobl

/** Source registry (SURVEY.md §2.12). Implemented v1 families:
  *
  *   - `generate` — Bloblang-mapping synthetic input
  *     (reference: docs/modules/components/pages/inputs/generate.adoc:26):
  *     batch form (`count` rows) and streaming form (`rate` source at
  *     `interval`); the mapping runs per generated row with an empty doc
  *     and can use `counter`-style fields via the provided `seq` column.
  *   - files — csv/json/parquet/text, batch + stream, envelope-wrapped
  *     on request (scanner `lines` ≈ text; other scanners compose as
  *     format + explode, SURVEY.md §2.12).
  *   - `kafka` — plan-level plumbing for Spark's kafka source; requires
  *     the spark-sql-kafka connector jar on the cluster classpath (not
  *     bundled here), options per the built-in source.
  *
  * CDC/JDBC/cloud families: out of scope v1 (SURVEY.md §2.12 priority).
  */
object Sources {

  /** Batch `generate`: `count` rows, mapping applied to an empty doc.
    * The mapping sees `this.seq` (0-based row number) for sequence-
    * dependent content — the deterministic analog of `counter()`.
    */
  def generate(spark: SparkSession, count: Long, mapping: String,
               envVars: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.range(count)
      .select(to_json(struct(col("id").as("seq"))).as(Envelope.ValueCol))
    val (withMeta, metaCol) = Blobl.ensureMeta(base, mapping)
    Blobl.mapping(withMeta, mapping, envVars, metadataCol = metaCol)
  }

  /** Streaming `generate`: rows at `rowsPerSecond`, same mapping
    * contract (`this.seq` from the rate source's value).
    */
  def generateStream(spark: SparkSession, rowsPerSecond: Int, mapping: String,
                     envVars: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(to_json(struct(col("value").as("seq"))).as(Envelope.ValueCol))
    val (withMeta, metaCol) = Blobl.ensureMeta(base, mapping)
    Blobl.mapping(withMeta, mapping, envVars, metadataCol = metaCol)
  }

  /** CSV file source (inputs/csv.adoc:26 — RFC 4180, header row). */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema)
      .csv(path)

  /** JSON-lines file source (scanner `lines` + JSON parse). */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Raw line source (inputs/file.adoc:26 with lines scanner):
    * envelope-shaped with the path in metadata.
    */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value").cast("string").as(Envelope.ValueCol),
        map(lit("path"), input_file_name()).as(Envelope.MetadataCol),
        lit(null).cast("string").as(Envelope.ErrorCol))

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Streaming file sources (cloudFiles-style directory listing). */
  def parquetStream(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.readStream.schema(ddlSchema).parquet(path)

  def csvStream(spark: SparkSession, path: String, ddlSchema: String,
                header: Boolean = true): DataFrame =
    spark.readStream.schema(ddlSchema).option("header", header).csv(path)

  /** Kafka source plumbing (inputs/kafka.adoc / input_redpanda.go:103):
    * ordered-per-partition like the reference's franz_reader_ordered.
    * NOTE: needs the spark-sql-kafka-0-10 connector jar at runtime.
    */
  def kafka(spark: SparkSession, bootstrapServers: String, topics: String,
            startingOffsets: String = "latest"): DataFrame =
    kafkaEnvelope(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .load())

  /** Batch form of [[kafka]] for the batch config runner: a bounded
    * earliest→latest scan (the connector plans one Spark task per
    * topic partition-range, same as the streaming source).
    */
  def kafkaBatch(spark: SparkSession, bootstrapServers: String,
                 topics: String): DataFrame =
    kafkaEnvelope(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load())

  private def kafkaEnvelope(raw: DataFrame): DataFrame =
    raw.select(col("value").cast("string").as(Envelope.ValueCol),
      map_concat(
        map(lit("kafka_topic"), col("topic")),
        map(lit("kafka_partition"), col("partition").cast("string")),
        map(lit("kafka_offset"), col("offset").cast("string")),
        map(lit("kafka_timestamp_unix"),
          unix_timestamp(col("timestamp")).cast("string")))
        .as(Envelope.MetadataCol),
      lit(null).cast("string").as(Envelope.ErrorCol))

  /** `broker` input (inputs/broker.adoc:26): merge N sources. */
  def broker(inputs: Seq[DataFrame]): DataFrame =
    inputs.reduce(_ unionByName _)

  /** Batch read of a broker topic through the [[Broker.Transport]]
    * seam (inputs/kafka.adoc): the driver plans one offset range per
    * broker partition and each Spark task scans exactly one of them —
    * the same task↔partition mapping the native kafka connector plans —
    * so per-partition offset order is preserved within each task
    * (franz_reader_ordered.go's strict-ordering contract).
    *
    * Envelope: `value` (null for tombstones), `metadata` with the
    * reference's kafka_&#42; fields (inputs/kafka.adoc Metadata section:
    * key/topic/partition/offset/timestamp_ms/timestamp_unix/lag/
    * tombstone_message) plus record headers, `error` null, and `__seq`
    * = offset (the PER-PARTITION ordinal — a topic has no global
    * order).
    */
  def brokerRead(spark: SparkSession, address: String, topic: String,
                 startOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    val transport = Broker.transportFor(address)
    val n = transport.partitionCount(topic)
    val ranges = (0 until n).map { p =>
      (p, startOffsets.getOrElse(p, 0L), transport.endOffset(topic, p))
    }
    val rows = spark.sparkContext
      .parallelize(ranges, math.max(n, 1))
      .flatMap { case (p, from, until) =>
        val t = Broker.transportFor(address) // resolve by name, executor-side
        t.fetch(topic, p, from, until).map { r =>
          val tombstone = r.value == null
          val meta = Map(
            "kafka_key" -> (if (r.key == null) null
                            else new String(r.key, "UTF-8")),
            "kafka_topic" -> topic,
            "kafka_partition" -> r.partition.toString,
            "kafka_offset" -> r.offset.toString,
            "kafka_timestamp_ms" -> r.timestampMs.toString,
            "kafka_timestamp_unix" -> (r.timestampMs / 1000L).toString,
            // inputs/kafka.adoc: high-water mark at ingestion minus the
            // current message offset ("until" IS the planned hwm)
            "kafka_lag" -> math.max(until - r.offset, 0L).toString,
            "kafka_tombstone_message" -> tombstone.toString) ++ r.headers
          org.apache.spark.sql.Row(
            if (tombstone) null else new String(r.value, "UTF-8"),
            meta, null, r.offset)
        }
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(Envelope.ValueCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(Envelope.MetadataCol,
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField(Envelope.ErrorCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__seq",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** `pulsar` input (inputs/pulsar.adoc) — pulsar's model (partitioned
    * topics, key routing, ordering keys) maps onto the same broker
    * transport; this read surfaces the pulsar_* metadata contract
    * (message id as partition:offset — the ledger:entry analog —
    * publish/event times, key, properties).
    */
  def pulsarRead(spark: SparkSession, address: String,
                 topic: String): DataFrame = {
    val df = brokerRead(spark, address, topic)
    val m = col(Envelope.MetadataCol)
    val base = map(
      lit("pulsar_message_id"),
      concat_ws(":", m("kafka_partition"), m("kafka_offset")),
      lit("pulsar_key"), coalesce(m("kafka_key"), lit("")),
      lit("pulsar_ordering_key"), coalesce(m("kafka_key"), lit("")),
      lit("pulsar_topic"), lit(topic),
      lit("pulsar_publish_time_unix"), m("kafka_timestamp_unix"),
      lit("pulsar_event_time_unix"), m("kafka_timestamp_unix"),
      lit("pulsar_redelivery_count"), lit("0"))
    val props = map_filter(m, (k, _) => !k.startsWith("kafka_"))
    df.withColumn(Envelope.MetadataCol, map_concat(base, props))
  }

  /** Binary-file source with the `tar`/`zip` scanner composed in
    * (reference file input scanners, docs/…/inputs/file.adoc scanner
    * section): each archive on disk explodes into one row per entry
    * (name, body), all executor-side — archives are never pulled to the
    * driver.
    */
  def archiveFiles(spark: SparkSession, pathGlob: String,
                   format: String = "tar"): DataFrame = {
    require(Seq("tar", "zip").contains(format), s"scanner: $format")
    graft.functions.expressions.GraftFunctions.register(spark)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"),
        explode(call_function(s"graft_un$format", col("content"))).as("entry"))
      .select(col("path"), col("entry.name").as("name"),
        col("entry.body").as("body"))
  }

  /** Binary-file source with the `decompress` scanner composed in
    * (docs/…/scanners/decompress.adoc), then a second scanner over the
    * decompressed body: `lines` (default), `to_the_end` (whole body =
    * one message), `chunker` (fixed-size character chunks,
    * scanners/chunker.adoc), or `re_match` (message boundaries at regex
    * matches, scanners/re_match.adoc). All executor-side — the file
    * decompresses where it was scanned, nothing moves to the driver.
    */
  def decompressFiles(spark: SparkSession, pathGlob: String, algo: String,
                      scanner: String = "lines",
                      pattern: String = "\n",
                      chunkSize: Int = 4096): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(spark)
    val raw = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    applyScanner(raw, algo, scanner, pattern, chunkSize)
  }

  /** Apply one text-family scanner to (path, content binary) rows —
    * the shared kernel behind [[decompressFiles]] and the per-file
    * routed [[switchFiles]].
    */
  private def applyScanner(files: DataFrame, algo: String, scanner: String,
                           pattern: String, chunkSize: Int): DataFrame = {
    // algo "none" = the plain-text scanner composition (config `file`
    // input with a `scanner:` block but no decompress stage)
    val body = skipBom(
      if (algo == "none") col("content").cast("string")
      else call_function("graft_decompress", col("content"), lit(algo))
        .cast("string"))
    val raw = files.select(col("path"), body.as("body"))
    scanner match {
      case "to_the_end" =>
        raw.select(col("path"), col("body").as(Envelope.ValueCol))
      case "lines" =>
        // split keeps a trailing "" when the body ends with the
        // separator — that artifact is not a message; mid-body empty
        // lines ARE messages and stay
        val parts = split(col("body"), "\n")
        val trimmed = when(element_at(parts, -1) === "",
          slice(parts, lit(1), size(parts) - 1)).otherwise(parts)
        raw.select(col("path"), explode(trimmed).as(Envelope.ValueCol))
      case "re_match" =>
        // reference semantics (scanners/re_match.adoc): message
        // boundaries sit at match START positions and the matched text
        // stays at the head of each message (e.g. (?m)^\d\d:\d\d:\d\d
        // keeps the timestamps) — unlike `lines`, nothing is removed.
        // Mark each match start with a \u0000 sentinel ($0 = the whole
        // match), split on it, and drop only the empty prelude when the
        // body begins with a match.
        val marked = regexp_replace(col("body"), pattern, "\u0000$0")
        val parts = split(marked, "\u0000")
        val segs = when(element_at(parts, 1) === "",
          slice(parts, lit(2), size(parts) - 1)).otherwise(parts)
        raw.select(col("path"), explode(segs).as(Envelope.ValueCol))
      case "chunker" =>
        raw.select(col("path"),
          explode(graft.functions.TextFunctions.chunks(
            col("body"), chunkSize, 0)).as(Envelope.ValueCol))
      case "json_documents" =>
        // scanners/json_documents.adoc: CONCATENATED json documents in
        // one stream → one message each; boundaries found by the
        // codegen'd graft_json_documents kernel (newlines are
        // optional, so `lines` cannot split this format)
        raw.select(col("path"),
          explode(call_function("graft_json_documents", col("body")))
            .as(Envelope.ValueCol))
      case other => throw new IllegalArgumentException(s"scanner: $other")
    }
  }

  /** One `switch` scanner candidate (scanners/switch.adoc): selected
    * when `reMatchName` matches the file name, or unconditionally when
    * absent (the documented catch-all).
    */
  final case class ScanCase(reMatchName: Option[String],
                            scanner: String = "lines",
                            algo: String = "none",
                            pattern: String = "\n",
                            chunkSize: Int = 4096)

  /** `switch` scanner (docs/…/scanners/switch.adoc): per-file scanner
    * selection — the FIRST candidate whose `re_match_name` matches the
    * file name wins; a pattern-less candidate is a catch-all; a file
    * matching no candidate is REJECTED with an error (the reference's
    * behavior), surfaced here as a row with `error` set and a null
    * value.
    *
    * Spark shape: ONE binaryFile scan; routing is a chained `when`
    * over the path (no per-candidate re-scan), each candidate's
    * scanner applied to its filtered branch, results unioned. The
    * branches share the single scan via plan reuse; everything stays
    * executor-side.
    */
  def switchFiles(spark: SparkSession, pathGlob: String,
                  cases: Seq[ScanCase]): DataFrame = {
    require(cases.nonEmpty, "switch scanner needs at least one candidate")
    graft.functions.expressions.GraftFunctions.register(spark)
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    // first-match-wins candidate index; -1 = rejected
    val idx = cases.zipWithIndex.foldRight(lit(-1)) {
      case ((c, i), els) =>
        c.reMatchName match {
          case Some(re) => when(regexp_like(col("path"), lit(re)), lit(i))
            .otherwise(els)
          case None => lit(i) // catch-all passes every source
        }
    }
    val routed = files.withColumn("__case", idx)
    val branches = cases.zipWithIndex.map { case (c, i) =>
      applyScanner(routed.filter(col("__case") === i)
          .select(col("path"), col("content")),
        c.algo, c.scanner, c.pattern, c.chunkSize)
        .withColumn(Envelope.ErrorCol, lit(null).cast("string"))
    }
    val rejected = routed.filter(col("__case") === -1)
      .select(col("path"), lit(null).cast("string").as(Envelope.ValueCol),
        concat(lit("switch scanner: no candidate matched "), col("path"))
          .as(Envelope.ErrorCol))
    (branches :+ rejected).reduce(_.unionByName(_))
  }

  /** `skip_bom` scanner (docs/…/scanners/skip_bom.adoc): strip a UTF-8
    * byte-order mark if present — composed into every text scanner
    * above.
    */
  def skipBom(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^\\uFEFF", "")

  /** JDBC source (reference `sql_select` input / CDC-adjacent families,
    * docs/…/inputs/sql_select.adoc:26): Spark's built-in JDBC reader
    * with partitioned parallel scans — `partitionColumn` splits the
    * table into `numPartitions` range-bounded queries so the read
    * scales with executors instead of a single cursor. Driver jar must
    * be on the cluster classpath (none bundled here).
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0, upperBound: Long = 0,
           numPartitions: Int = 8,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).options(options)
    partitionColumn match {
      case Some(pc) => r.option("partitionColumn", pc)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions).load()
      case None => r.load()
    }
  }
}
