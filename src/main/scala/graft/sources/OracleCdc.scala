package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** `oracledb_cdc` input (internal/impl/oracledb — contract only, no
  * code ported): Oracle CDC mines the redo log through LogMiner,
  * which surfaces committed changes as SQL_REDO TEXT in
  * `V$LOGMNR_CONTENTS` — reconstructed `insert into …`/`update …`/
  * `delete from …` statements with quoted identifiers and Oracle
  * literal functions. The connector's real work is therefore a
  * PARSER + a transaction cache, both implemented here against the
  * documented text forms (sqlredo/parser_test.go's public corpus
  * re-asserted as OracleCdcSpec):
  *
  *   - [[SqlRedo.parse]]: quoted identifiers (`"O'Brien"`, doubled-
  *     quote escapes), `''`-escaped strings, `NULL`, the bare
  *     `Unsupported Type` placeholder, function literals
  *     (`TO_DATE/TO_TIMESTAMP/TO_TIMESTAMP_TZ/HEXTORAW/UNISTR` with
  *     `||` concatenation), optional table aliases, `IS [NOT] NULL`
  *     predicates excluded from the old-values map;
  *   - [[ValueConverter]]: the literal-function decodes (dates by
  *     format, hex → bytes, UNISTR UTF-16 escapes);
  *   - [[TxnCache]]: XID-keyed buffering — events emit only on
  *     COMMIT (ROLLBACK discards), and the safe checkpoint SCN is the
  *     LOW WATERMARK across open transactions (logminer/cache.go:28 —
  *     advancing past an open txn's start SCN would lose its events
  *     on restart).
  *
  * The polled surface (DBMS_LOGMNR.START_LOGMNR + the
  * V$LOGMNR_CONTENTS SCN-window query) is environment-blocked here
  * (no Oracle engine); [[contents]] admits recorded rows in exactly
  * that query's column shape, the same recorded-stream playbook as
  * pgoutput/binlog.
  */
object OracleCdc {

  /** One V$LOGMNR_CONTENTS row: (scn, xid, operationCode, sqlRedo).
    * Operation codes: 1=INSERT, 2=DELETE, 3=UPDATE, 6=START,
    * 7=COMMIT, 36=ROLLBACK.
    */
  final case class RedoRow(scn: Long, xid: String, op: Int, sql: String)

  final case class DmlEvent(op: String, schema: String, table: String,
                            newValues: Seq[(String, Option[String])],
                            oldValues: Seq[(String, Option[String])])

  object SqlRedo {

    final class ParseError(msg: String) extends RuntimeException(msg)

    def parse(sql: String): DmlEvent = {
      val s = new Scanner(sql)
      s.skipWs()
      val kw = s.word().toLowerCase
      kw match {
        case "insert" => parseInsert(s)
        case "update" => parseUpdate(s)
        case "delete" => parseDelete(s)
        case other => throw new ParseError(s"not a DML statement: $other")
      }
    }

    private def parseInsert(s: Scanner): DmlEvent = {
      s.expectWord("into")
      val (schema, table) = s.qualifiedName()
      s.skipWs(); s.expect('(')
      val cols = mutable.ArrayBuffer.empty[String]
      var more = true
      while (more) {
        cols += s.identifier()
        s.skipWs()
        more = s.tryConsume(',')
      }
      s.expect(')')
      s.expectWord("values")
      s.skipWs(); s.expect('(')
      val vals = mutable.ArrayBuffer.empty[Option[String]]
      more = true
      while (more) {
        vals += s.value()
        s.skipWs()
        more = s.tryConsume(',')
      }
      s.expect(')')
      if (cols.size != vals.size)
        throw new ParseError(s"${cols.size} columns, ${vals.size} values")
      DmlEvent("insert", schema, table, cols.toSeq.zip(vals.toSeq), Nil)
    }

    private def parseUpdate(s: Scanner): DmlEvent = {
      val (schema, table) = s.qualifiedName()
      // optional alias before SET
      s.skipWs()
      val save = s.pos
      val maybeAlias = if (s.peekIsWord) s.word() else ""
      val alias =
        if (maybeAlias.equalsIgnoreCase("set")) { s.pos = save; "" }
        else maybeAlias
      s.expectWord("set")
      val sets = mutable.ArrayBuffer.empty[(String, Option[String])]
      var more = true
      while (more) {
        val col = s.aliasedIdentifier(alias)
        s.skipWs(); s.expect('=')
        sets += ((col, s.value()))
        s.skipWs()
        more = s.tryConsume(',')
      }
      val olds = whereClause(s, alias)
      DmlEvent("update", schema, table, sets.toSeq, olds)
    }

    private def parseDelete(s: Scanner): DmlEvent = {
      s.expectWord("from")
      val (schema, table) = s.qualifiedName()
      s.skipWs()
      val save = s.pos
      val alias =
        if (s.peekIsWord) {
          val w = s.word()
          if (w.equalsIgnoreCase("where")) { s.pos = save; "" } else w
        } else ""
      DmlEvent("delete", schema, table, Nil, whereClause(s, alias))
    }

    /** `where "C"='v' and "C2" IS NULL …` — IS [NOT] NULL predicates
      * are EXCLUDED from the map (parser_test.go:159).
      */
    private def whereClause(s: Scanner,
                            alias: String): Seq[(String, Option[String])] = {
      s.skipWs()
      if (s.atEnd || s.peek == ';') return Nil
      s.expectWord("where")
      val out = mutable.ArrayBuffer.empty[(String, Option[String])]
      var more = true
      while (more) {
        val col = s.aliasedIdentifier(alias)
        s.skipWs()
        if (s.tryWord("IS")) {
          s.tryWord("NOT") // IS NOT NULL
          s.expectWord("NULL") // excluded either way
        } else {
          s.expect('=')
          out += ((col, s.value()))
        }
        s.skipWs()
        more = s.tryWord("and")
      }
      out.toSeq
    }

    /** Character scanner for the redo text. */
    private final class Scanner(val src: String) {
      var pos = 0
      def atEnd: Boolean = pos >= src.length
      def peek: Char = src.charAt(pos)
      def skipWs(): Unit =
        while (!atEnd && Character.isWhitespace(peek)) pos += 1
      def peekIsWord: Boolean = { skipWs(); !atEnd && isWordChar(peek) }
      private def isWordChar(c: Char) =
        Character.isLetterOrDigit(c) || c == '_' || c == '$' || c == '#'
      def word(): String = {
        skipWs()
        val start = pos
        while (!atEnd && isWordChar(peek)) pos += 1
        if (pos == start) throw new ParseError(
          s"expected word at $pos in: ${src.take(80)}")
        src.substring(start, pos)
      }
      def expectWord(w: String): Unit = {
        val g = word()
        if (!g.equalsIgnoreCase(w))
          throw new ParseError(s"expected '$w', got '$g'")
      }
      def tryWord(w: String): Boolean = {
        skipWs()
        val save = pos
        if (!atEnd && isWordChar(peek)) {
          val g = word()
          if (g.equalsIgnoreCase(w)) true else { pos = save; false }
        } else false
      }
      def expect(c: Char): Unit = {
        skipWs()
        if (atEnd || peek != c) throw new ParseError(
          s"expected '$c' at $pos in: ${src.take(80)}")
        pos += 1
      }
      def tryConsume(c: Char): Boolean = {
        skipWs()
        if (!atEnd && peek == c) { pos += 1; true } else false
      }

      /** `"Quoted Ident"` (doubled-quote escape) or bare word. */
      def identifier(): String = {
        skipWs()
        if (!atEnd && peek == '"') {
          pos += 1
          val sb = new StringBuilder
          var done = false
          while (!done) {
            if (atEnd) throw new ParseError("unterminated identifier")
            val c = src.charAt(pos)
            if (c == '"') {
              if (pos + 1 < src.length && src.charAt(pos + 1) == '"') {
                sb += '"'; pos += 2
              } else { pos += 1; done = true }
            } else { sb += c; pos += 1 }
          }
          sb.toString
        } else word()
      }

      /** Identifier with an optional `alias.` prefix stripped. */
      def aliasedIdentifier(alias: String): String = {
        skipWs()
        if (alias.nonEmpty) {
          val save = pos
          if (peekIsWord) {
            val w = word()
            if (w == alias && tryConsume('.')) return identifier()
            pos = save
          }
        }
        identifier()
      }

      def qualifiedName(): (String, String) = {
        val first = identifier()
        skipWs()
        if (tryConsume('.')) (first, identifier()) else ("", first)
      }

      /** One value: quoted string (unescaped), NULL → None,
        * `Unsupported Type` → None, or a function/numeric expression
        * captured verbatim to the value boundary (paren-balanced,
        * quote-aware — `UNISTR('a') || UNISTR('b')` is ONE value).
        */
      def value(): Option[String] = {
        skipWs()
        if (peek == '\'') return Some(stringLiteral())
        if (tryWord("NULL")) return None
        if (tryWord("Unsupported")) { tryWord("Type"); return None }
        // balanced expression until ',' or ')' at depth 0
        val start = pos
        var depth = 0
        var done = false
        while (!done && !atEnd) {
          val c = peek
          if (c == '\'') stringLiteral()
          else {
            if (c == '(') depth += 1
            else if (c == ')') {
              if (depth == 0) done = true else depth -= 1
            } else if (c == ',' && depth == 0) done = true
            if (!done) pos += 1
          }
        }
        Some(src.substring(start, pos).trim)
      }

      def stringLiteral(): String = {
        expect('\'')
        val sb = new StringBuilder
        var done = false
        while (!done) {
          if (atEnd) throw new ParseError("unterminated string literal")
          val c = src.charAt(pos)
          if (c == '\'') {
            if (pos + 1 < src.length && src.charAt(pos + 1) == '\'') {
              sb += '\''; pos += 2
            } else { pos += 1; done = true }
          } else { sb += c; pos += 1 }
        }
        sb.toString
      }
    }
  }

  object ValueConverter {
    private val ToDate =
      """(?i)TO_DATE\('([^']+)',\s*'[^']*'\)""".r
    private val ToTimestamp =
      """(?i)TO_TIMESTAMP\('([^']+)'(?:,\s*'[^']*')?\)""".r
    private val ToTimestampTz =
      """(?i)TO_TIMESTAMP_TZ\('([^']+)'\)""".r
    private val HexToRaw =
      """(?i)HEXTORAW\('([0-9A-Fa-f]+)'\)""".r
    private val UniStrSeg = """(?i)UNISTR\('((?:[^']|'')*)'\)""".r

    /** Raw parser value → canonical string (dates normalized to
      * `yyyy-MM-dd HH:mm:ss[.ffffff]`, raw as lowercase hex, UNISTR
      * decoded, plain strings/numbers as-is).
      */
    def convert(v: String): String = v match {
      case ToDate(value) => value.trim
      case ToTimestamp(value) => value.trim.stripSuffix(".")
      case ToTimestampTz(value) => value.trim
      case HexToRaw(hex) => hex.toLowerCase
      case other if other.toUpperCase.startsWith("UNISTR(") =>
        decodeUnistr(other)
      case other => other
    }

    /** `UNISTR('caf\00e9') [|| UNISTR('…')]*` → decoded string. */
    def decodeUnistr(expr: String): String = {
      val segs = UniStrSeg.findAllMatchIn(expr).map(_.group(1)).toSeq
      if (segs.isEmpty) return expr
      val sb = new StringBuilder
      segs.foreach { seg =>
        val body = seg.replace("''", "'")
        var i = 0
        while (i < body.length) {
          val c = body.charAt(i)
          if (c == '\\' && i + 1 < body.length && body.charAt(i + 1) == '\\') {
            sb += '\\'; i += 2
          } else if (c == '\\' && i + 4 < body.length) {
            sb += Integer.parseInt(body.substring(i + 1, i + 5), 16).toChar
            i += 5
          } else { sb += c; i += 1 }
        }
      }
      sb.toString
    }
  }

  /** XID-keyed buffering with the low-watermark checkpoint rule. */
  final class TxnCache {
    private val open =
      mutable.LinkedHashMap.empty[String, (Long, mutable.ArrayBuffer[(Long, DmlEvent)])]

    def start(xid: String, scn: Long): Unit =
      if (!open.contains(xid)) open(xid) = (scn, mutable.ArrayBuffer.empty)

    def add(xid: String, scn: Long, e: DmlEvent): Unit = {
      start(xid, scn)
      open(xid)._2 += ((scn, e))
    }

    /** COMMIT: emit this txn's events in arrival order. */
    def commit(xid: String): Seq[(Long, DmlEvent)] =
      open.remove(xid).map(_._2.toSeq).getOrElse(Nil)

    def rollback(xid: String): Unit = { open.remove(xid); () }

    /** The safe checkpoint: the lowest start SCN among open txns
      * excluding `excludeXid` (Long.MaxValue when none) —
      * logminer/cache.go:142's contract.
      */
    def lowWatermark(excludeXid: String = ""): Long =
      open.collect { case (x, (scn, _)) if x != excludeXid => scn }
        .foldLeft(Long.MaxValue)(math.min)

    def openCount: Int = open.size
  }

  /** Fold a recorded V$LOGMNR_CONTENTS stream into typed committed
    * changes: returns (rows, checkpointScn) where each row carries
    * `__op` (c/u/d), `__scn` (commit-position ordinal) and the
    * CONVERTED column values as strings keyed by lowercase name.
    */
  def assemble(rows: Seq[RedoRow])
      : (Seq[(Long, String, DmlEvent)], Long) = {
    val cache = new TxnCache
    val out = Seq.newBuilder[(Long, String, DmlEvent)]
    var checkpoint = 0L
    rows.foreach { r =>
      r.op match {
        case 6 => cache.start(r.xid, r.scn)
        case 1 | 2 | 3 =>
          cache.add(r.xid, r.scn, SqlRedo.parse(r.sql))
        case 7 =>
          cache.commit(r.xid).foreach { case (scn, e) =>
            out += ((scn, opCode(e.op), e))
          }
          val lw = cache.lowWatermark()
          checkpoint = if (lw == Long.MaxValue) r.scn else math.min(lw, r.scn)
        case 36 => cache.rollback(r.xid)
        case _ => () // DDL/other: skipped
      }
    }
    (out.result(), checkpoint)
  }

  private def opCode(op: String): String = op match {
    case "insert" => "c"
    case "update" => "u"
    case "delete" => "d"
    case other => other
  }

  /** Recorded stream → typed DataFrame for `Cdc.latestState`:
    * `columns` names (lowercased output) + `__op` + `__ord` (emission
    * order). Updates take new values with old values filling gaps;
    * deletes carry old values (the key columns).
    */
  def changes(spark: SparkSession, rows: Seq[RedoRow],
              table: String, columns: Seq[String]): DataFrame = {
    val (events, _) = assemble(rows)
    val data = events.zipWithIndex.collect {
      case (((_, op, e)), i) if e.table.equalsIgnoreCase(table) =>
        val vals = mutable.LinkedHashMap.empty[String, String]
        e.oldValues.foreach { case (k, v) =>
          vals(k.toLowerCase) = v.map(ValueConverter.convert).orNull
        }
        e.newValues.foreach { case (k, v) =>
          vals(k.toLowerCase) = v.map(ValueConverter.convert).orNull
        }
        Row.fromSeq(columns.map(c => vals.get(c.toLowerCase).orNull) ++
          Seq(op, i.toLong))
    }
    val schema = org.apache.spark.sql.types.StructType(
      columns.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType)) ++ Seq(
        org.apache.spark.sql.types.StructField("__op",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__ord",
          org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1,
        math.min(8, data.size))), schema)
  }

  /** Recorded V$LOGMNR_CONTENTS rows as JSON lines
    * (`{"scn":…,"xid":"…","op":…,"sql":"…"}`) — the redo_file form of
    * the recorded-stream playbook (pgoutput wal_file / binlog_file).
    */
  def readRedoFile(path: String): Seq[RedoRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { l =>
        val n = mapper.readTree(l)
        RedoRow(n.path("scn").asLong, n.path("xid").asText,
          n.path("op").asInt, n.path("sql").asText)
      }
  }

  def writeRedoFile(path: String, rows: Seq[RedoRow]): Unit = {
    val sb = new StringBuilder
    rows.foreach { r =>
      val sqlEsc = r.sql.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      sb.append(s"""{"scn":${r.scn},"xid":"${r.xid}","op":${r.op},"sql":"$sqlEsc"}\n""")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      sb.toString)
  }

  /** Independent fixture: renders typed rows as LogMiner-shaped redo
    * text (the encoder side of the recorded-stream playbook — the
    * parser never sees its own output format helpers).
    */
  object Fixture {
    def esc(s: String): String = s.replace("'", "''")

    def insert(schema: String, table: String,
               vals: Seq[(String, Any)]): String = {
      val cols = vals.map { case (c, _) => s""""${c.toUpperCase}"""" }
        .mkString(",")
      val vs = vals.map { case (_, v) => lit(v) }.mkString(",")
      s"""insert into "${schema.toUpperCase}"."${table.toUpperCase}" ($cols) values ($vs)"""
    }

    def update(schema: String, table: String, sets: Seq[(String, Any)],
               where: Seq[(String, Any)]): String = {
      val setStr = sets.map { case (c, v) =>
        s""""${c.toUpperCase}" = ${lit(v)}""" }.mkString(", ")
      val whereStr = where.map { case (c, v) =>
        s""""${c.toUpperCase}" = ${lit(v)}""" }.mkString(" and ")
      s"""update "${schema.toUpperCase}"."${table.toUpperCase}" set $setStr where $whereStr"""
    }

    def delete(schema: String, table: String,
               where: Seq[(String, Any)]): String = {
      val whereStr = where.map { case (c, v) =>
        s""""${c.toUpperCase}" = ${lit(v)}""" }.mkString(" and ")
      s"""delete from "${schema.toUpperCase}"."${table.toUpperCase}" where $whereStr"""
    }

    private def lit(v: Any): String = v match {
      case null => "NULL"
      case ts: java.sql.Timestamp =>
        val s = ts.toString.stripSuffix(".0")
        s"TO_TIMESTAMP('$s')"
      case d: java.time.LocalDate =>
        s"TO_DATE('$d','YYYY-MM-DD')"
      case other => s"'${esc(String.valueOf(other))}'"
    }
  }
}
