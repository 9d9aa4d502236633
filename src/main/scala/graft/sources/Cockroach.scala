package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** `cockroachdb_changefeed` input
  * (internal/impl/cockroachdb/input_changefeed.go — contract only, no
  * code ported): a Core Changefeed is ONE long-running SQL statement
  * whose result rows are `(table, key, value)`:
  *
  *   - statement text: `EXPERIMENTAL CHANGEFEED FOR t1, t2 WITH …` —
  *     with a `cursor_cache`, user-supplied CURSOR options are
  *     STRIPPED and `UPDATED` + `CURSOR="<ts>"` are set explicitly
  *     (input_changefeed.go:129-143);
  *   - message shape: `{"table":…,"primary_key":"<stringified JSON
  *     array>","row":"<stringified JSON object>"}` —
  *     input_changefeed.go:287-291;
  *   - the delivered cursor is the row value's `updated` MVCC
  *     timestamp; the highest acked one persists in the cache under
  *     `crdb_changefeed_cursor`, so a restart resumes instead of
  *     re-backfilling (no cursor → full-state backfill first).
  *
  * A live rangefeed socket is environment-blocked; the statement
  * executes against the pluggable [[Feed]] seam — [[MemCluster]]
  * implements it over an in-memory MVCC history, parsing the real
  * statement text (tables + CURSOR) like the engine would.
  */
object Cockroach {

  val CursorCacheKey = "crdb_changefeed_cursor"

  /** Execute one changefeed statement → (table, keyJson, valueJson)
    * rows — the pgwire row shape of the Core Changefeed.
    */
  type Feed = String => Seq[(String, String, String)]

  /** The statement builder, cursor semantics included. */
  def statement(tables: Seq[String], options: Seq[String],
                cursor: Option[String], managed: Boolean): String = {
    val opts =
      if (!managed) options
      else options.filterNot(_.toLowerCase.startsWith("cursor")) ++
        Seq("UPDATED") ++
        cursor.map(c => s"""CURSOR="$c"""").toSeq
    val optStr = if (opts.isEmpty) "" else opts.mkString(" WITH ", ", ", "")
    s"EXPERIMENTAL CHANGEFEED FOR ${tables.mkString(", ")}$optStr"
  }

  /** Bounded drain: build the statement from the persisted cursor,
    * execute, emit messages, persist the highest delivered cursor.
    */
  def read(spark: SparkSession, feed: Feed, tables: Seq[String],
           options: Seq[String] = Nil,
           cursorStore: Cursors.Store = null): DataFrame = {
    val managed = cursorStore != null
    val cursor = Option(cursorStore).flatMap(_.get(CursorCacheKey))
    val stmt = statement(tables, options, cursor, managed)
    val rows = feed(stmt)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var maxCursor: String = cursor.orNull
    val out = rows.map { case (table, keyJson, valueJson) =>
      val updated = mapper.readTree(valueJson).path("updated").asText("")
      if (updated.nonEmpty && (maxCursor == null || updated > maxCursor))
        maxCursor = updated
      val payload = mapper.writeValueAsString(
        java.util.Map.of("table", table, "primary_key", keyJson,
          "row", valueJson))
      Row(payload, Map("table" -> table), null)
    }
    if (managed && maxCursor != null)
      cursorStore.set(CursorCacheKey, maxCursor)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out,
        math.max(1, math.min(8, out.size))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("metadata",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField("error",
          org.apache.spark.sql.types.StringType))))
  }

  /** PollStream poller: cursor = highest delivered MVCC timestamp. */
  def poller(feed: Feed, tables: Seq[String]): PollStream.Poller =
    cursor => {
      val stmt = statement(tables, Nil, cursor, managed = true)
      val rows = feed(stmt)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      var maxCursor: String = cursor.orNull
      val out = rows.map { case (table, keyJson, valueJson) =>
        val updated = mapper.readTree(valueJson).path("updated").asText("")
        if (updated.nonEmpty && (maxCursor == null || updated > maxCursor))
          maxCursor = updated
        (mapper.writeValueAsString(java.util.Map.of(
          "table", table, "primary_key", keyJson, "row", valueJson)),
          Map("table" -> table))
      }
      (out.toVector, Option(maxCursor))
    }

  /** `mem://name` cluster registry — the config-form seam: a test or
    * gate seeds a named cluster, the YAML's `dsn` references it.
    */
  private val clusters =
    new java.util.concurrent.ConcurrentHashMap[String, MemCluster]()
  def register(name: String): MemCluster =
    clusters.computeIfAbsent(name, _ => new MemCluster)
  def clusterFor(dsn: String): MemCluster = {
    require(dsn.startsWith("mem://"),
      s"cockroachdb_changefeed: only mem:// DSNs exist in this environment (got $dsn)")
    register(dsn.stripPrefix("mem://"))
  }
  def drop(name: String): Unit = { clusters.remove(name); () }

  /** In-memory MVCC cluster: per-table keyed rows with `updated`
    * timestamps. Executes the REAL statement text: no cursor → full
    * current-state backfill (each row stamped with its latest MVCC
    * ts), cursor → only rows whose ts is strictly greater.
    */
  final class MemCluster {
    // table → key(json array) → (valueFieldsJson, updatedTs)
    private val tables = mutable.LinkedHashMap.empty[String,
      mutable.LinkedHashMap[String, (String, String)]]
    private var hlc = 0L

    /** Monotone HLC-shaped timestamp `<wall>.<logical>`. */
    def nextTs(): String = synchronized {
      hlc += 1
      f"${1700000000000000000L + hlc * 1000}%d.0000000001"
    }

    def upsert(table: String, keyJson: String,
               valueFieldsJson: String): String = synchronized {
      val ts = nextTs()
      tables.getOrElseUpdate(table, mutable.LinkedHashMap.empty)
        .update(keyJson, (valueFieldsJson, ts))
      ts
    }

    private val StmtRe =
      """EXPERIMENTAL CHANGEFEED FOR ([^ ]+(?:, [^ ]+)*)(?: WITH (.*))?""".r

    def feed: Feed = stmt => synchronized {
      stmt match {
        case StmtRe(tablesCsv, optsOrNull) =>
          val wanted = tablesCsv.split(", ").toSeq
          val opts = Option(optsOrNull).map(_.split(", ").toSeq)
            .getOrElse(Nil)
          require(opts.contains("UPDATED") || opts.isEmpty,
            "mem crdb: managed feeds must request UPDATED")
          val cursor = opts.collectFirst {
            case o if o.startsWith("CURSOR=\"") =>
              o.stripPrefix("CURSOR=\"").stripSuffix("\"")
          }
          wanted.flatMap { t =>
            tables.getOrElse(t, mutable.LinkedHashMap.empty).toSeq
              .filter { case (_, (_, ts)) => cursor.forall(ts > _) }
              .map { case (key, (fields, ts)) =>
                val value =
                  s"""{"after":$fields,"updated":"$ts"}"""
                (t, key, value)
              }
          }
        case other => throw new IllegalArgumentException(
          s"mem crdb: not a changefeed statement: ${other.take(80)}")
      }
    }
  }
}
