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
      // 21-char nanoid alphabet subset via uuid entropy
      BV(substring(regexp_replace(uuid(), "-", ""), 1, 21), S)
    case "ksuid" | "ulid" | "snowflake_id" =>
      throw new IllegalArgumentException(
        s"$name() not implemented (v1) — use uuid_v4()")

    case "random_int" =>
      val bound = args.headOption.map(asLong).getOrElse(lit(Long.MaxValue))
      BV((rand() * bound.cast("double")).cast("long"), I)

    case "range" =>
      val (a, b) = (asLong(args(0)), asLong(args(1)))
      val step = if (args.length > 2) asLong(args(2)) else lit(1L)
      // reference range is exclusive of the upper bound
      BV(sequence(a, b - lit(1L), step), A(I))

    case "pi" => BV(lit(math.Pi), F)

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

    case "batch_index" | "batch_size" | "count" | "counter" =>
      throw new IllegalArgumentException(
        s"$name() is batch/stream-scoped — use graft.operators.BatchOps")

    case other =>
      throw new IllegalArgumentException(s"unknown blobl function: $other")
    }
  }
}
