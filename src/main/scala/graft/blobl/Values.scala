package graft.blobl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compile-time value model for the Bloblang-subset compiler.
  *
  * Bloblang is uni-typed (reference: docs/modules/guides/pages/bloblang/
  * about.adoc:118); Catalyst is statically typed. Each compiled
  * expression carries a static tag where one is known (literal, typed
  * column, method result) and falls back to `V` (Spark VariantType) where
  * the type is dynamic — coercions insert casts only at the boundaries,
  * so statically-typed subtrees stay fully codegen'd.
  */
object Values {

  sealed trait BT
  object BT {
    case object V extends BT                  // VariantType (dynamic)
    case object S extends BT                  // string
    case object I extends BT                  // long
    case object F extends BT                  // double
    case object B extends BT                  // boolean
    case object TS extends BT                 // timestamp
    case object Bin extends BT                // binary
    case class A(elem: BT) extends BT         // array<elem>
    case object J extends BT                  // JSON object as string
    case object N extends BT                  // null literal
    case object Del extends BT                // deleted() marker
  }
  import BT._

  /** Compiled value. `omitNull` marks values whose null means "absent"
    * (if-without-else, deleted()-bearing branches): object keys and
    * array elements drop them instead of writing null
    * (reference: config/test/bloblang/literals.yaml:1-25).
    */
  case class BV(col: Column, t: BT, omitNull: Boolean = false)

  /** Sentinel string standing in for `deleted()` inside structures; the
    * JSON kernels strip keys/elements holding exactly this value.
    */
  val DeletedSentinel: String =
    graft.functions.expressions.JsonKernel.DeletedSentinel

  def asString(v: BV): Column = v.t match {
    case S => v.col
    case N | Del => lit(null).cast("string")
    case F =>
      // Go formats float64 with strconv 'g': whole values print with
      // no fraction ("3", not "3.0") — reference methods.adoc string()
      import org.apache.spark.sql.functions.{abs, floor, when}
      when(v.col === floor(v.col) && abs(v.col) < 9.007199254740992e15,
        v.col.cast("long").cast("string"))
        .otherwise(v.col.cast("string"))
    case _ => v.col.cast("string")
  }

  def asLong(v: BV): Column = v.t match {
    case I => v.col
    case N | Del => lit(null).cast("long")
    case _ => v.col.cast("long")
  }

  def asDouble(v: BV): Column = v.t match {
    case F => v.col
    case N | Del => lit(null).cast("double")
    case _ => v.col.cast("double")
  }

  def asBool(v: BV): Column = v.t match {
    case B => v.col
    case N | Del => lit(null).cast("boolean")
    case _ => v.col.cast("boolean")
  }

  def asTimestamp(v: BV): Column = v.t match {
    case TS => v.col
    case I => timestamp_seconds(v.col)
    case N | Del => lit(null).cast("timestamp")
    case _ => v.col.cast("timestamp")
  }

  /** Array view; dynamic values become array<variant>. */
  def asArray(v: BV): BV = v.t match {
    case A(_) => v
    case V => BV(v.col.cast("array<variant>"), A(V))
    case _ => BV(v.col.cast("array<variant>"), A(V))
  }

  /** Variant view — the dynamic-union escape hatch. Primitives cast
    * straight to variant; JSON strings are parsed.
    */
  def asVariant(v: BV): Column = v.t match {
    case V => v.col
    case J => parse_json(v.col)
    case N | Del => lit(null).cast("variant")
    case _ => v.col.cast("variant")
  }

  /** Serialize a value to its JSON text. */
  def toJsonText(v: BV): Column = v.t match {
    case J => v.col
    case S => to_json(asVariant(v)) // quoted/escaped string
    case _ => to_json(asVariant(v))
  }

  /** Unify two static types for if/coalesce branches: equal tags stay,
    * anything else widens to variant.
    */
  def unify(a: BT, b: BT): BT = (a, b) match {
    case (x, y) if x == y => x
    case (N, y) => y
    case (x, N) => x
    case (Del, y) => y
    case (x, Del) => x
    case (I, F) | (F, I) => F
    case _ => V
  }

  /** Cast a value to a target unified type. */
  def asType(v: BV, t: BT): Column = t match {
    case S => asString(v)
    case I => asLong(v)
    case F => asDouble(v)
    case B => asBool(v)
    case TS => asTimestamp(v)
    case V => asVariant(v)
    case A(_) => asArray(v).col
    case J => toJsonText(v)
    case _ => v.col
  }

  def numericResult(a: BV, b: BV): BT =
    if (a.t == I && b.t == I) I else F

  def numOperand(v: BV, t: BT): Column = if (t == I) asLong(v) else asDouble(v)
}
