package graft.sources

/** Per-dialect SQL text for the reference's 12 `sql_driver_*`
  * registrations (internal/impl/sql/conn_fields.go:30 — mysql,
  * postgres, pgx, clickhouse, mssql, sqlite, oracle, snowflake, trino,
  * gocosmos, spanner, databricks). The reference builds its statements
  * with squirrel and swaps the placeholder format per driver
  * (output_sql_insert.go:171-176: Dollar for postgres/pgx/clickhouse,
  * Colon for oracle/gocosmos, `?` otherwise); this layer renders the
  * same per-dialect text — placeholders, identifier quoting, LIMIT
  * forms, and the idiomatic upsert statement — without needing the
  * driver jars, so statement generation is testable (DialectSpec
  * goldens) and the executable Derby seam (JdbcSpec/MsSqlCdc) keeps
  * running the `?`-placeholder shape it already does.
  */
object SqlDialect {

  /** Placeholder style: `?`, `$1..$n`, or `:1..:n`. */
  sealed trait Placeholders extends Serializable {
    def render(n: Int): Seq[String]
  }
  case object Question extends Placeholders {
    def render(n: Int): Seq[String] = Seq.fill(n)("?")
  }
  case object Dollar extends Placeholders {
    def render(n: Int): Seq[String] = (1 to n).map(i => s"$$$i")
  }
  case object Colon extends Placeholders {
    def render(n: Int): Seq[String] = (1 to n).map(i => s":$i")
  }

  /** How a dialect caps a SELECT. */
  sealed trait LimitForm extends Serializable
  /** `... LIMIT n` appended (mysql/postgres/sqlite/…). */
  case object LimitSuffix extends LimitForm
  /** `SELECT TOP n ...` injected after SELECT (mssql). */
  case object TopPrefix extends LimitForm
  /** `... FETCH FIRST n ROWS ONLY` (oracle ≥12c, ANSI). */
  case object FetchFirst extends LimitForm

  /** One driver's text conventions. `upsert` renders the dialect's
    * idiomatic insert-or-update for (table, columns, keys); dialects
    * with no native upsert (clickhouse — merges on the engine; trino —
    * append-only connectors) fall back to plain INSERT, which is what
    * their drivers accept.
    */
  final case class Dialect(name: String,
                           placeholders: Placeholders,
                           quoteL: String, quoteR: String,
                           limitForm: LimitForm,
                           upsertStyle: String,
                           // MERGE source: oracle/derby need a FROM on
                           // the single-row source select (dual /
                           // SYSIBM.SYSDUMMY1); others allow FROM-less
                           mergeFrom: String = "") {
    def quote(ident: String): String =
      if (quoteL.isEmpty) ident
      else quoteL + ident.replace(quoteR, quoteR + quoteR) + quoteR

    /** INSERT INTO t (c1, c2) VALUES (…placeholders…) with the
      * reference's prefix / options / suffix hooks
      * (output_sql_insert.go:49-63).
      */
    def insert(table: String, columns: Seq[String],
               prefix: String = "", options: Seq[String] = Nil,
               suffix: String = ""): String = {
      require(columns.nonEmpty, "sql_insert needs columns")
      val opts = if (options.isEmpty) "" else options.mkString(" ", " ", "")
      val core = s"INSERT$opts INTO ${quote(table)} " +
        s"(${columns.map(quote).mkString(", ")}) " +
        s"VALUES (${placeholders.render(columns.size).mkString(", ")})"
      Seq(prefix, core, suffix).filter(_.nonEmpty).mkString(" ")
    }

    /** SELECT cols FROM t [WHERE …] [ORDER BY …] [LIMIT n] in the
      * dialect's cap form (input_sql_select.go builder surface).
      */
    def select(table: String, columns: Seq[String],
               where: Option[String] = None,
               orderBy: Seq[String] = Nil,
               limit: Option[Int] = None): String = {
      val cols =
        if (columns.isEmpty) "*" else columns.map(quote).mkString(", ")
      val top = limitForm match {
        case TopPrefix => limit.map(n => s"TOP $n ").getOrElse("")
        case _ => ""
      }
      val sb = new StringBuilder(s"SELECT $top$cols FROM ${quote(table)}")
      where.foreach(w => sb.append(s" WHERE $w"))
      if (orderBy.nonEmpty)
        sb.append(s" ORDER BY ${orderBy.map(quote).mkString(", ")}")
      limitForm match {
        case LimitSuffix => limit.foreach(n => sb.append(s" LIMIT $n"))
        case FetchFirst =>
          limit.foreach(n => sb.append(s" FETCH FIRST $n ROWS ONLY"))
        case TopPrefix => ()
      }
      sb.toString
    }

    /** The dialect's idiomatic insert-or-update on `keys`. */
    def upsert(table: String, columns: Seq[String],
               keys: Seq[String]): String = {
      require(keys.nonEmpty && keys.forall(columns.contains),
        "upsert keys must be a subset of columns")
      val nonKeys = columns.filterNot(keys.contains)
      val ph = placeholders.render(columns.size)
      val colList = columns.map(quote).mkString(", ")
      val phList = ph.mkString(", ")
      upsertStyle match {
        case "on_conflict" => // postgres / sqlite
          val sets = nonKeys.map(c => s"${quote(c)} = excluded.${quote(c)}")
          s"INSERT INTO ${quote(table)} ($colList) VALUES ($phList) " +
            s"ON CONFLICT (${keys.map(quote).mkString(", ")}) " +
            (if (nonKeys.isEmpty) "DO NOTHING"
             else s"DO UPDATE SET ${sets.mkString(", ")}")
        case "on_duplicate" => // mysql
          val sets = nonKeys.map(c => s"${quote(c)} = VALUES(${quote(c)})")
          s"INSERT INTO ${quote(table)} ($colList) VALUES ($phList)" +
            (if (nonKeys.isEmpty) ""
             else s" ON DUPLICATE KEY UPDATE ${sets.mkString(", ")}")
        case "merge" => // mssql / oracle / snowflake / spanner / databricks / gocosmos
          val src = columns.zip(ph)
            .map { case (c, p) => s"$p AS ${quote(c)}" }.mkString(", ")
          val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}")
            .mkString(" AND ")
          val sets = nonKeys.map(c => s"t.${quote(c)} = s.${quote(c)}")
            .mkString(", ")
          val ins = s"INSERT (${columns.map(quote).mkString(", ")}) " +
            s"VALUES (${columns.map(c => s"s.${quote(c)}").mkString(", ")})"
          s"MERGE INTO ${quote(table)} t USING (SELECT $src$mergeFrom) s ON ($on) " +
            (if (nonKeys.isEmpty) ""
             else s"WHEN MATCHED THEN UPDATE SET $sets ") +
            s"WHEN NOT MATCHED THEN $ins"
        case "plain" => // clickhouse / trino: no row-level upsert
          insert(table, columns)
        case other =>
          throw new IllegalArgumentException(s"upsert style $other")
      }
    }

    /** Bulk stage-then-merge: MERGE from a staged source TABLE — the
      * shape warehouse sinks actually use at scale (load a stage, one
      * set-based merge) and the only MERGE source some engines accept
      * (Derby: base table or table function only).
      */
    def upsertFromTable(table: String, source: String,
                        columns: Seq[String], keys: Seq[String]): String = {
      require(keys.nonEmpty && keys.forall(columns.contains),
        "upsert keys must be a subset of columns")
      val nonKeys = columns.filterNot(keys.contains)
      val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}")
        .mkString(" AND ")
      val sets = nonKeys.map(c => s"t.${quote(c)} = s.${quote(c)}")
        .mkString(", ")
      val ins = s"INSERT (${columns.map(quote).mkString(", ")}) " +
        s"VALUES (${columns.map(c => s"s.${quote(c)}").mkString(", ")})"
      s"MERGE INTO ${quote(table)} t USING ${quote(source)} s ON ($on) " +
        (if (nonKeys.isEmpty) ""
         else s"WHEN MATCHED THEN UPDATE SET $sets ") +
        s"WHEN NOT MATCHED THEN $ins"
    }
  }

  /** The 12 registrations (conn_fields.go driver enum), plus derby —
    * the executable stand-in this environment ships (JdbcSpec).
    */
  val all: Map[String, Dialect] = Map(
    "mysql" -> Dialect("mysql", Question, "`", "`", LimitSuffix, "on_duplicate"),
    "postgres" -> Dialect("postgres", Dollar, "\"", "\"", LimitSuffix, "on_conflict"),
    "pgx" -> Dialect("pgx", Dollar, "\"", "\"", LimitSuffix, "on_conflict"),
    "clickhouse" -> Dialect("clickhouse", Dollar, "\"", "\"", LimitSuffix, "plain"),
    "mssql" -> Dialect("mssql", Question, "[", "]", TopPrefix, "merge"),
    "sqlite" -> Dialect("sqlite", Question, "\"", "\"", LimitSuffix, "on_conflict"),
    "oracle" -> Dialect("oracle", Colon, "\"", "\"", FetchFirst, "merge",
      mergeFrom = " FROM dual"),
    "snowflake" -> Dialect("snowflake", Question, "\"", "\"", LimitSuffix, "merge"),
    "trino" -> Dialect("trino", Question, "\"", "\"", LimitSuffix, "plain"),
    "gocosmos" -> Dialect("gocosmos", Colon, "\"", "\"", LimitSuffix, "merge"),
    "spanner" -> Dialect("spanner", Question, "`", "`", LimitSuffix, "merge"),
    "databricks" -> Dialect("databricks", Question, "`", "`", LimitSuffix, "merge"),
    // executable stand-in: unquoted identifiers (Derby folds unquoted
    // to upper-case; quoting would break tables created unquoted)
    "derby" -> Dialect("derby", Question, "", "", FetchFirst, "merge",
      mergeFrom = " FROM SYSIBM.SYSDUMMY1"))

  def apply(driver: String): Dialect =
    all.getOrElse(driver, throw new IllegalArgumentException(
      s"unknown sql driver: $driver (one of ${all.keys.toSeq.sorted.mkString(", ")})"))
}
