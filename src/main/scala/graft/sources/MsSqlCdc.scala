package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `microsoft_sql_server_cdc` input
  * (internal/impl/mssqlserver/input_mssqlserver_cdc.go:33,
  * replication/stream.go:117,378 — contract only, no code ported):
  * SQL Server CDC is not a wire protocol but a POLLED SQL surface —
  * the engine writes committed changes into per-table change tables
  * (`cdc.<schema>_<table>_CT`) and the connector repeatedly reads the
  * window `(last_lsn, fn_cdc_get_max_lsn()]` ordered by
  * `__$start_lsn, __$command_id, __$operation`.
  *
  * Semantics carried over exactly:
  *   - LSN windows are EXCLUSIVE of the cursor, INCLUSIVE of the
  *     ceiling; the committed cursor after a sweep is the ceiling;
  *   - `__$operation`: 1=delete, 2=insert, 3=update_before,
  *     4=update_after — update emits BOTH images as separate messages
  *     (the reference's operation metadata values);
  *   - optional snapshot pass first (`stream_snapshot`) emitting
  *     `read` ops that fold like inserts;
  *   - metadata per message: database_schema / table / operation /
  *     lsn (hex) — input_mssqlserver_cdc.go's documented set.
  *
  * The SQL text is dialect-pluggable: [[MsSqlDialect]] renders the
  * reference's exact query shapes (bracket quoting, NOLOCK hint,
  * `sys.fn_cdc_get_max_lsn()`); [[DerbyDialect]] renders the same
  * queries for the embedded Derby engine that exists in this
  * environment, so the full polling/windowing/folding path runs for
  * real under the oracle gate. LSNs travel as fixed-width lowercase
  * hex strings (binary(10) → 20 chars), which order lexicographically
  * exactly like the binary values.
  *
  * Scale shape: windowed change reads go through Spark's JDBC source
  * (executor-side fetch); only the tiny `max_lsn` probe runs on the
  * driver. Snapshot reads are range-partitioned JDBC scans — the
  * reference's parallel-snapshot knob maps to `numPartitions`.
  */
object MsSqlCdc {

  final case class TableRef(schema: String, name: String) {
    def captureInstance: String = s"${schema}_$name"
  }

  val ZeroLsn: String = "0" * 20

  /** Renders the polling SQL for one engine. */
  sealed trait Dialect extends Serializable {
    def changeTable(t: TableRef): String
    def baseTable(t: TableRef): String
    /** reference shape: stream.go:117 */
    def windowQuery(t: TableRef, fromExclusive: String,
                    toInclusive: String): String
    def maxLsnQuery(tables: Seq[TableRef]): String
    /** CT column names as they surface through JDBC. */
    def lsnCol: String
    def seqCol: String
    def opCol: String
    def cmdCol: String
  }

  /** The real SQL Server text — character-for-character the
    * reference's query modulo bound parameters rendered inline
    * (stream.go builds `SELECT * FROM cdc.<s>_<t>_CT WITH (NOLOCK)
    * WHERE ... ORDER BY [__$start_lsn] ASC, [__$command_id] ASC,
    * [__$operation] ASC`).
    */
  object MsSqlDialect extends Dialect {
    def changeTable(t: TableRef): String = s"cdc.${t.schema}_${t.name}_CT"
    def baseTable(t: TableRef): String = s"[${t.schema}].[${t.name}]"
    def windowQuery(t: TableRef, fromEx: String, toInc: String): String =
      s"SELECT * FROM ${changeTable(t)} WITH (NOLOCK) " +
        s"WHERE [__$$start_lsn] > $hexPrefix$fromEx AND " +
        s"[__$$start_lsn] <= $hexPrefix$toInc " +
        "ORDER BY [__$start_lsn] ASC, [__$command_id] ASC, [__$operation] ASC"
    def maxLsnQuery(tables: Seq[TableRef]): String =
      "SELECT sys.fn_cdc_get_max_lsn()"
    private val hexPrefix = "0x"
    val lsnCol = "__$start_lsn"
    val seqCol = "__$seqval"
    val opCol = "__$operation"
    val cmdCol = "__$command_id"
  }

  /** Same queries for embedded Derby: CT tables live as
    * `CDC_<SCHEMA>_<TABLE>_CT` (Derby has no `cdc` pseudo-schema or
    * bracket quoting), LSNs are stored as their hex strings, and the
    * db-wide max-LSN probe is the max across the change tables.
    */
  object DerbyDialect extends Dialect {
    def changeTable(t: TableRef): String =
      s"CDC_${t.schema.toUpperCase}_${t.name.toUpperCase}_CT"
    def baseTable(t: TableRef): String =
      s"${t.schema.toUpperCase}_${t.name.toUpperCase}"
    def windowQuery(t: TableRef, fromEx: String, toInc: String): String =
      s"SELECT * FROM ${changeTable(t)} " +
        s"WHERE START_LSN > '$fromEx' AND START_LSN <= '$toInc' " +
        "ORDER BY START_LSN ASC, COMMAND_ID ASC, OPERATION ASC"
    def maxLsnQuery(tables: Seq[TableRef]): String =
      tables.map(t => s"SELECT MAX(START_LSN) AS L FROM ${changeTable(t)}")
        .mkString("SELECT MAX(L) FROM (", " UNION ALL ", ") T")
    val lsnCol = "START_LSN"
    val seqCol = "SEQVAL"
    val opCol = "OPERATION"
    val cmdCol = "COMMAND_ID"
  }

  /** `__$operation` → the reference's operation metadata value. */
  def opName(op: Int): String = op match {
    case 1 => "delete"
    case 2 => "insert"
    case 3 => "update_before"
    case 4 => "update_after"
    case other => s"op_$other"
  }

  /** Driver-side probe: highest LSN the engine has written (None when
    * no changes exist yet).
    */
  def maxLsn(url: String, tables: Seq[TableRef],
             dialect: Dialect = MsSqlDialect): Option[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(dialect.maxLsnQuery(tables))
      if (rs.next()) Option(rs.getString(1)) else None
    } finally conn.close()
  }

  /** The change window `(fromExclusive, toInclusive]` for one table as
    * typed rows: captured columns + `__op` (fold code: c/u/d/ub) +
    * `operation` (reference metadata value) + `__lsn`/`__cmd` (change
    * order). Executor-side JDBC fetch; ordering is re-established
    * relationally downstream (a global sort here would shuffle for
    * nothing when the consumer folds by key).
    */
  def changes(spark: SparkSession, url: String, t: TableRef,
              fromExclusive: Option[String], toInclusive: String,
              dialect: Dialect = MsSqlDialect): DataFrame = {
    val q = dialect.windowQuery(t,
      fromExclusive.getOrElse(ZeroLsn), toInclusive)
    val raw = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"($q) W")
      .load()
    // one SELECT: under Spark's case-insensitive resolution a
    // withColumn("operation", …) would REPLACE the CT's OPERATION
    // column before the later expressions read it
    val opC = col(s"`${dialect.opCol}`")
    val ctCols = Set(dialect.lsnCol, dialect.seqCol, dialect.opCol,
      dialect.cmdCol).map(_.toUpperCase)
    val captured = raw.columns
      .filterNot(c => ctCols.contains(c.toUpperCase)).map(col).toSeq
    raw.select(captured ++ Seq(
      when(opC === 1, "delete").when(opC === 2, "insert")
        .when(opC === 3, "update_before").otherwise("update_after")
        .as("operation"),
      when(opC === 1, "d").when(opC === 2, "c")
        .when(opC === 3, "ub").otherwise("u").as("__op"),
      col(s"`${dialect.lsnCol}`").cast("string").as("__lsn"),
      col(s"`${dialect.cmdCol}`").cast("int").as("__cmd")): _*)
  }

  /** Snapshot pass (`stream_snapshot: true`): the base table as `read`
    * ops at LSN zero — range-partitioned when a numeric key is given
    * (the reference's parallel snapshot).
    */
  def snapshot(spark: SparkSession, url: String, t: TableRef,
               dialect: Dialect = MsSqlDialect,
               partitionColumn: Option[String] = None,
               lowerBound: Long = 0, upperBound: Long = 0,
               numPartitions: Int = 8): DataFrame =
    Sources.jdbc(spark, url, dialect.baseTable(t), partitionColumn,
        lowerBound, upperBound, numPartitions)
      .withColumn("operation", lit("read"))
      .withColumn("__op", lit("r"))
      .withColumn("__lsn", lit(ZeroLsn))
      .withColumn("__cmd", lit(0))

  /** Snapshot + all changes up to `toInclusive`, folded to current
    * state: latest change per key wins, delete removes, update_before
    * images are excluded from folding (they are messages, not state).
    */
  def currentState(spark: SparkSession, url: String, t: TableRef,
                   keyCols: Seq[String], toInclusive: String,
                   dialect: Dialect = MsSqlDialect): DataFrame = {
    val snap = snapshot(spark, url, t, dialect)
    val chg = changes(spark, url, t, None, toInclusive, dialect)
    val ops = snap.unionByName(chg, allowMissingColumns = true)
      .filter(col("__op") =!= "ub")
      .withColumn("__ts_ms",
        concat(col("__lsn"), lpad(col("__cmd").cast("string"), 10, "0")))
    Cdc.latestState(ops, keyCols, col("__ts_ms"))
      .drop("operation", "__lsn", "__cmd")
  }

  /** Streaming poller (PollStream shape: OFFSET IS THE CURSOR = last
    * delivered LSN). Each sweep probes max LSN and drains the window
    * `(cursor, max]` over driver JDBC — the reference's single
    * replication reader is likewise one connection; emitted payloads
    * fan out through the stream's InputPartitions.
    */
  def poller(url: String, tables: Seq[TableRef],
             dialect: Dialect = MsSqlDialect): PollStream.Poller = cursor => {
    val from = cursor.getOrElse(ZeroLsn)
    maxLsn(url, tables, dialect) match {
      case None => (Vector.empty, cursor)
      case Some(to) if to <= from => (Vector.empty, cursor)
      case Some(to) =>
        val conn = DriverManager.getConnection(url)
        try {
          val out = Vector.newBuilder[PollStream.Payload]
          tables.foreach { t =>
            val rs = conn.createStatement()
              .executeQuery(dialect.windowQuery(t, from, to))
            val md = rs.getMetaData
            val n = md.getColumnCount
            while (rs.next()) {
              var op = 0
              var lsn = ""
              val fields = Vector.newBuilder[(String, String)]
              (1 to n).foreach { i =>
                val name = md.getColumnName(i)
                if (name.equalsIgnoreCase(dialect.opCol)) op = rs.getInt(i)
                else if (name.equalsIgnoreCase(dialect.lsnCol))
                  lsn = rs.getString(i)
                else if (!name.equalsIgnoreCase(dialect.seqCol) &&
                         !name.equalsIgnoreCase(dialect.cmdCol))
                  fields += name.toLowerCase ->
                    Option(rs.getString(i)).getOrElse("")
              }
              val value = fields.result()
                .map { case (k, v) => s""""$k":"${v.replace("\"", "\\\"")}"""" }
                .mkString("{", ",", "}")
              out += ((value, Map(
                "database_schema" -> t.schema, "table" -> t.name,
                "operation" -> opName(op), "lsn" -> lsn)))
            }
          }
          (out.result(), Some(to))
        } finally conn.close()
    }
  }
}
