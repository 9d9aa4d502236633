package graft.blobl

import org.apache.spark.sql.functions._

import Values._
import Values.BT._

/** Bloblang function registry (reference:
  * docs/modules/guides/pages/bloblang/functions.adoc:31-963).
  *
  * `env`/`file` resolve at COMPILE time like the reference resolves them
  * once per stream build (SURVEY.md §3.2); batch-scoped functions
  * (`batch_index`, `from_all`) need batch context and surface as
  * explicit batch operators instead (graft.operators.BatchOps).
  */
object Functions {
  import Ast._

  private def litStrOf(e: Expr, what: String): String = e match {
    case StrLit(s) => s
    case other =>
      throw new IllegalArgumentException(s"$what needs a string literal, got $other")
  }

  def apply(name: String, argAsts: Seq[Expr], env: Compiler.Env): BV = {
    lazy val args = argAsts.map(Compiler.compile(_, env))
    name match {
    case "deleted" => BV(lit(DeletedSentinel), Del)

    case "env" =>
      val key = litStrOf(argAsts.head, "env()")
      env.envVars.get(key) match {
        case Some(v0) => BV(lit(v0), S)
        case None => BV(lit(null).cast("string"), S)
      }

    case "hostname" =>
      BV(lit(java.net.InetAddress.getLocalHost.getHostName), S)

    case "now" => BV(date_format(current_timestamp(),
      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"), S)
    case "timestamp_unix" => BV(unix_timestamp(current_timestamp()), I)
    case "timestamp_unix_milli" => BV(unix_micros(current_timestamp()) / 1000L, I)
    case "timestamp_unix_micro" => BV(unix_micros(current_timestamp()), I)
    case "timestamp_unix_nano" => BV(unix_micros(current_timestamp()) * 1000L, I)

    case "uuid_v4" => BV(uuid(), S)
    case "nanoid" =>
      // nanoid alphabet subset via uuid entropy; optional length arg
      val len = argAsts.headOption
        .collect { case Ast.IntLit(n) => n.toInt }.getOrElse(21)
      BV(substring(regexp_replace(uuid(), "-", ""), 1, len), S)
    case "ksuid" | "ulid" | "snowflake_id" =>
      // format kernels over (time, uuid-entropy) — see IdOps
      import org.apache.spark.sql.GraftColumnBridge
      val kind = if (name == "snowflake_id") "snowflake" else name
      val timeCol =
        if (name == "ksuid") unix_timestamp(current_timestamp())
        else unix_millis(current_timestamp())
      BV(GraftColumnBridge.column(
        graft.functions.expressions.IdFormat(
          GraftColumnBridge.expression(timeCol),
          GraftColumnBridge.expression(regexp_replace(uuid(), "-", "")),
          kind)), S)

    case "random_int" =>
      val bound = args.headOption.map(asLong).getOrElse(lit(Long.MaxValue))
      BV((rand() * bound.cast("double")).cast("long"), I)

    case "range" =>
      val (a, b) = (asLong(args(0)), asLong(args(1)))
      val step = if (args.length > 2) asLong(args(2)) else lit(1L)
      // reference range is exclusive of the upper bound
      BV(sequence(a, b - lit(1L), step), A(I))

    case "pi" => BV(lit(math.Pi), F)

    // ── message context (functions.adoc message section) ──────────────
    case "meta" => env.metaCol match {
      case Some(m) =>
        if (argAsts.isEmpty) BV(parse_json(to_json(m)), V)
        else BV(element_at(m, litStrOf(argAsts.head, "meta()")), S)
      case None => throw new IllegalArgumentException(
        "meta() needs a metadata-bound mapping (metadataCol)")
    }
    case "root_meta" => apply("meta", argAsts, env)
    case "bytes" =>
      apply("content", argAsts, env) match {
        case BV(c, _, _) => BV(c.cast("binary"), Bin)
      }
    // Error-channel accessors: the envelope's `error` column (SURVEY
    // §1.3). Resolves at analysis time — mappings over frames without
    // an error column fail fast there.
    case "error" => BV(org.apache.spark.sql.functions.col("error"), S)
    case "errored" =>
      BV(org.apache.spark.sql.functions.col("error").isNotNull, B)
    case "error_source_label" | "error_source_name" | "error_source_path" =>
      // single-plan execution has no named component chain; the error
      // column itself carries the failing stage's message
      BV(lit(null).cast("string"), S)

    // ── synthetic data (functions.adoc fake) ──────────────────────────
    case "fake" =>
      // deterministic-per-row synthetic values (uuid-entropy based; the
      // reference's faker is random per call — same contract, stable
      // layout)
      val kind = litStrOf(argAsts.head, "fake()")
      val seed = regexp_replace(uuid(), "-", "")
      kind match {
        case "email" =>
          BV(concat(substring(seed, 1, 8), lit("@example.com")), S)
        case "name" | "first_name" =>
          BV(initcap(substring(seed, 1, 6)), S)
        case "uuid" => BV(uuid(), S)
        case "phone_number" =>
          BV(concat(lit("+1-555-"), substring(conv(substring(seed, 1, 6),
            16, 10), 1, 7)), S)
        case other => throw new IllegalArgumentException(
          s"fake($other) unsupported (email/name/uuid/phone_number)")
      }

    // file contents resolve at COMPILE time, like the reference's config
    // parse (functions.adoc file/file_rel)
    case "file" | "file_rel" =>
      val p = litStrOf(argAsts.head, s"$name()")
      BV(lit(java.nio.file.Files.readString(java.nio.file.Paths.get(p))), S)

    case "uuid_v7" =>
      // v7 layout: 48-bit unix-millis prefix + random tail (time-ordered
      // ids for sinks that sort by key)
      val millis = lpad(lower(hex(unix_millis(current_timestamp()))), 12, "0")
      val tail = regexp_replace(uuid(), "-", "")
      BV(concat(
        substring(millis, 1, 8), lit("-"), substring(millis, 9, 4),
        lit("-7"), substring(tail, 1, 3),
        lit("-"), substring(tail, 4, 4),
        lit("-"), substring(tail, 8, 12)), S)

    case "tracing_id" | "tracing_span" =>
      // no tracer attached in plan execution — empty like the
      // reference without an active span
      BV(lit(null).cast("string"), S)

    case "throw" =>
      // error-channel discipline: errors are data, not exceptions —
      // represented as null payload (caught by catch/|)
      BV(lit(null), N)

    case "content" => env.binding match {
      // the message's VERBATIM content (may not be JSON) — not a
      // re-serialization of the parsed tree
      case Compiler.Json(_, rawCol) => BV(rawCol, S)
      case _ => throw new IllegalArgumentException("content() needs JSON mode")
    }

    case "json" =>
      val path = argAsts.headOption
        .map(a => litStrOf(a, "json()").split('.').toSeq)
        .getOrElse(Seq.empty)
      env.resolveThis(path)

    case "metadata" =>
      val m = env.metaCol.getOrElse(
        throw new IllegalArgumentException("no metadata column bound"))
      args.headOption match {
        case Some(k) => BV(element_at(m, asString(k)), S)
        case None => BV(to_json(m), J)
      }

    case "batch_index" =>
      // 0-based position within the batch (functions.adoc:446-479):
      // rank over the envelope ordinal within `__batch` when present —
      // frames without __seq fail at analysis, which is the right time
      // to learn the op needs batch context
      BV((row_number().over(Compiler.batchPart(env)
        .orderBy(org.apache.spark.sql.functions.col("__seq"))) - 1)
        .cast("long"), I)
    case "batch_size" =>
      BV(count(lit(1)).over(Compiler.batchFrame(env)), I)

    case "count" | "counter" =>
      throw new IllegalArgumentException(
        s"$name() is stream-scoped — use graft.operators.BatchOps.namedCounter")

    case other =>
      throw new IllegalArgumentException(s"unknown blobl function: $other")
    }
  }
}
