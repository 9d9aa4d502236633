package graft.blobl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import Values._
import Values.BT._

/** Pins the bloblang method surface against the reference's documented
  * inventory (docs/modules/guides/pages/bloblang/methods.adoc, all 189
  * `===`-level entries = 186 unique names — `contains`, `length` and
  * `slice` are each documented twice, once in the string section and
  * once in the object/array section, same dispatch name): every
  * documented name must DISPATCH — reach a real implementation in
  * [[Methods]] (arity/type errors are fine, they prove the name is
  * known) — and an unknown name must fail at compile time with the
  * explicit unknown-method error, never silently no-op.
  */
class MethodInventorySpec extends AnyFunSuite {

  /** The reference's complete documented method list, verbatim. */
  private val documented = Seq(
    "abs", "all", "any", "append", "array", "assign", "bitwise_and",
    "bitwise_or", "bitwise_xor", "bloblang", "bool", "bytes", "capitalize",
    "ceil", "collapse", "compare_argon2", "compare_bcrypt", "compress",
    "concat", "contains", "cos", "decode", "decompress", "decrypt_aes",
    "diff", "encode", "encrypt_aes", "enumerated", "escape_html",
    "escape_url_path", "escape_url_query", "exists", "explode",
    "filepath_join", "filepath_split", "filter", "find", "find_all",
    "find_all_by", "find_by", "flatten", "float32", "float64", "floor",
    "fold", "format", "format_json", "format_msgpack", "format_timestamp",
    "format_timestamp_strftime", "format_timestamp_unix",
    "format_timestamp_unix_micro", "format_timestamp_unix_milli",
    "format_timestamp_unix_nano", "format_xml", "format_yaml",
    "geoip_anonymous_ip", "geoip_asn", "geoip_city", "geoip_connection_type",
    "geoip_country", "geoip_domain", "geoip_enterprise", "geoip_isp", "get",
    "has_prefix", "has_suffix", "hash", "index", "index_of", "infer_schema",
    "int16", "int32", "int64", "int8", "join", "json_path", "json_schema",
    "key_values", "keys", "length", "log", "log10", "lowercase", "map_each",
    "map_each_key", "max", "merge", "min", "not_empty", "not_null", "number",
    "parse_csv", "parse_duration", "parse_duration_iso8601",
    "parse_form_url_encoded", "parse_json", "parse_jwt_es256",
    "parse_jwt_es384", "parse_jwt_es512", "parse_jwt_hs256",
    "parse_jwt_hs384", "parse_jwt_hs512", "parse_jwt_rs256",
    "parse_jwt_rs384", "parse_jwt_rs512", "parse_logfmt", "parse_msgpack",
    "parse_parquet", "parse_timestamp", "parse_timestamp_strptime",
    "parse_url", "parse_xml", "parse_yaml", "patch", "pow", "quote",
    "re_find_all", "re_find_all_object", "re_find_all_submatch",
    "re_find_object", "re_match", "re_replace", "re_replace_all", "repeat",
    "replace", "replace_all", "replace_all_many", "replace_many", "reverse",
    "round", "sign_jwt_es256", "sign_jwt_es384", "sign_jwt_es512",
    "sign_jwt_hs256", "sign_jwt_hs384", "sign_jwt_hs512", "sign_jwt_rs256",
    "sign_jwt_rs384", "sign_jwt_rs512", "sin", "slice", "slug", "sort",
    "sort_by", "split", "squash", "string", "strip_html", "sum", "tan",
    "timestamp", "trim", "trim_prefix", "trim_suffix", "ts_add_iso8601",
    "ts_format", "ts_parse", "ts_round", "ts_strftime", "ts_strptime",
    "ts_sub", "ts_sub_iso8601", "ts_tz", "ts_unix", "ts_unix_micro",
    "ts_unix_milli", "ts_unix_nano", "type", "uint16", "uint32", "uint64",
    "uint8", "unescape_html", "unescape_url_path", "unescape_url_query",
    "unicode_segments", "unique", "unquote", "uppercase", "uuid_v5",
    "values", "vector", "with", "without", "zip")

  /** True when `name` reaches an implementation: any outcome except the
    * dispatcher's own unknown-method error counts (an arity/type error
    * from inside a case proves the case exists).
    */
  private def dispatches(name: String): Boolean = {
    val recv = BV(lit("10"), S)
    val sArg = Methods.MVal(BV(lit("a"), S), Some("a"))
    val lArg = Methods.MLam(identity)
    val attempts: Seq[Seq[Methods.MArg]] = Seq(
      Seq.empty, Seq(sArg), Seq(sArg, sArg), Seq(sArg, sArg, sArg),
      Seq(lArg), Seq(sArg, lArg))
    attempts.exists { args =>
      try { Methods.apply(recv, name, args); true }
      catch {
        case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.startsWith("unknown blobl method") => false
        case _: Throwable => true
      }
    }
  }

  test("all documented methods dispatch to an implementation") {
    assert(documented.size == 186, "inventory drifted from methods.adoc")
    val missing = documented.filterNot(dispatches)
    assert(missing.isEmpty,
      s"documented methods with no implementation: ${missing.mkString(", ")}")
  }

  test("an unknown method fails loudly at compile time") {
    val e = intercept[IllegalArgumentException] {
      Methods.apply(BV(lit("x"), S), "definitely_not_a_method", Seq.empty)
    }
    assert(e.getMessage.contains("unknown blobl method"))
  }
}
