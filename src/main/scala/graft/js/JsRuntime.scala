package graft.js

import scala.collection.mutable

/** Runtime value model + coercions for the ES5-subset engine.
  *
  * Values: Double (every JS number), String, java.lang.Boolean, `null`,
  * [[JsUndefined]], [[JsObject]], [[JsArray]], [[JsFunction]] /
  * [[HostFunc]], [[JsRegex]]. Export to the JVM (metadata, structured
  * messages) converts integral doubles to Long — the same convention
  * the reference's engine uses when exporting to Go (its tests assert
  * `int64(2)` for `Object.keys(x).length`).
  */
object JsRuntime {

  object JsUndefined extends Serializable {
    override def toString: String = "undefined"
  }

  final class JsObject(val fields: mutable.LinkedHashMap[String, Any] =
                         mutable.LinkedHashMap.empty) {
    var className: String = "Object" // "Error", "TypeError", …
    def get(k: String): Any = fields.getOrElse(k, JsUndefined)
    def has(k: String): Boolean = fields.contains(k)
    def set(k: String, v: Any): Unit = fields(k) = v
    def delete(k: String): Unit = fields.remove(k)
  }

  final class JsArray(val elems: mutable.ArrayBuffer[Any] =
                        mutable.ArrayBuffer.empty)

  /** User function: params + body + closure. `thisV` is bound at call
    * time for normal functions, captured for arrows.
    */
  final class JsFunction(val name: String,
                         val params: Seq[JsAst.Param],
                         val body: Seq[JsAst.Stmt],
                         val exprBody: Option[JsAst.Expr],
                         val closure: Env,
                         val arrow: Boolean)

  final class HostFunc(val name: String,
                       val fn: (Any, Seq[Any]) => Any)

  final class BoundFunc(val target: Any, val fn: Any, val boundArgs: Seq[Any])

  final class JsRegex(val source: String, val flags: String) {
    val global: Boolean = flags.contains('g')
    val pattern: java.util.regex.Pattern = {
      var f = 0
      if (flags.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE
      if (flags.contains('m')) f |= java.util.regex.Pattern.MULTILINE
      if (flags.contains('s')) f |= java.util.regex.Pattern.DOTALL
      java.util.regex.Pattern.compile(source, f)
    }
    var lastIndex: Int = 0
  }

  /** A thrown JS value (Error object, string, anything). Stackless:
    * JS-level throws are control flow (try/catch), not JVM faults.
    */
  final class JsError(val value: Any)
      extends RuntimeException(errMessage(value), null, false, false)

  def errMessage(v: Any): String = v match {
    case o: JsObject if o.has("message") => toStr(o.get("message"))
    case other => toStr(other)
  }

  def newError(name: String, msg: String): JsObject = {
    val o = new JsObject
    o.className = name
    o.set("name", name)
    o.set("message", msg)
    o
  }

  def throwError(name: String, msg: String): Nothing =
    throw new JsError(newError(name, msg))

  /** Scope chain. `thisV` is the receiver visible to `this`. The var
    * map allocates lazily — most block/loop scopes declare nothing,
    * and per-iteration HashMap churn dominates tight loops otherwise.
    */
  final class Env(val parent: Env, val thisV: Any) {
    private var vars: mutable.HashMap[String, Any] = null
    private def m: mutable.HashMap[String, Any] = {
      if (vars == null) vars = new mutable.HashMap(4, 0.75)
      vars
    }
    def declare(name: String, v: Any): Unit = m(name) = v
    def has(name: String): Boolean =
      (vars != null && vars.contains(name)) ||
        (parent != null && parent.has(name))
    def lookup(name: String): Any = {
      if (vars != null) {
        val v = vars.getOrElse(name, NotFound)
        if (v.asInstanceOf[AnyRef] ne NotFound) return v
      }
      if (parent != null) parent.lookup(name)
      else throwError("ReferenceError", s"$name is not defined")
    }
    def assign(name: String, v: Any): Unit =
      if (vars != null && vars.contains(name)) vars(name) = v
      else if (parent != null) parent.assign(name, v)
      else m(name) = v // implicit global
    def declaredHere(name: String): Boolean =
      vars != null && vars.contains(name)
  }

  private object NotFound

  // ---- coercions ----

  def truthy(v: Any): Boolean = v match {
    case null | JsUndefined => false
    case b: Boolean => b
    case d: Double => d != 0.0 && !d.isNaN
    case s: String => s.nonEmpty
    case _ => true
  }

  def toNum(v: Any): Double = v match {
    case d: Double => d
    case b: Boolean => if (b) 1.0 else 0.0
    case null => 0.0
    case JsUndefined => Double.NaN
    case s: String =>
      val t = s.trim
      if (t.isEmpty) 0.0
      else try {
        if (t.startsWith("0x") || t.startsWith("0X"))
          java.lang.Long.parseLong(t.substring(2), 16).toDouble
        else t.toDouble
      } catch { case _: NumberFormatException => Double.NaN }
    case a: JsArray =>
      if (a.elems.isEmpty) 0.0
      else if (a.elems.size == 1) toNum(a.elems.head)
      else Double.NaN
    case _ => Double.NaN
  }

  def toInt32(v: Any): Int = {
    val d = toNum(v)
    if (d.isNaN || d.isInfinite) 0 else d.toLong.toInt
  }

  def toUint32(v: Any): Long = {
    val d = toNum(v)
    if (d.isNaN || d.isInfinite) 0L else d.toLong & 0xffffffffL
  }

  /** JS Number→String (spec-shaped for the common range). */
  def numToString(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == 0.0) "0"
    else if (d == d.toLong && math.abs(d) < 1e21) d.toLong.toString
    else {
      val s = java.lang.Double.toString(d)
      // 1.0E21 → 1e+21, 1.0E-7 → 1e-7 (JS style)
      if (s.contains('E')) {
        val Array(mant, exp) = s.split('E')
        val m = if (mant.endsWith(".0")) mant.dropRight(2) else mant
        val e = if (exp.startsWith("-")) exp else "+" + exp
        s"${m}e$e"
      } else s
    }

  def toStr(v: Any): String = v match {
    case s: String => s
    case d: Double => numToString(d)
    case b: Boolean => if (b) "true" else "false"
    case null => "null"
    case JsUndefined => "undefined"
    case a: JsArray => a.elems.map {
      case null | JsUndefined => ""
      case e => toStr(e)
    }.mkString(",")
    case o: JsObject if o.className.endsWith("Error") =>
      val n = toStr(o.get("name")); val m = toStr(o.get("message"))
      if (m.isEmpty) n else s"$n: $m"
    case _: JsObject => "[object Object]"
    case f: JsFunction => s"function ${f.name}() { [code] }"
    case f: HostFunc => s"function ${f.name}() { [native code] }"
    case r: JsRegex => s"/${r.source}/${r.flags}"
    case other => String.valueOf(other)
  }

  def typeOf(v: Any): String = v match {
    case null => "object"
    case JsUndefined => "undefined"
    case _: Boolean => "boolean"
    case _: Double => "number"
    case _: String => "string"
    case _: JsFunction | _: HostFunc | _: BoundFunc => "function"
    case _ => "object"
  }

  /** Loose equality (==) — the spec's table, minus exotic cases. */
  def looseEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) | (JsUndefined, JsUndefined) => true
    case (null, JsUndefined) | (JsUndefined, null) => true
    case (null, _) | (_, null) | (JsUndefined, _) | (_, JsUndefined) => false
    case (x: Double, y: Double) => x == y
    case (x: String, y: String) => x == y
    case (x: Boolean, y: Boolean) => x == y
    case (x: Double, y: String) => x == toNum(y)
    case (x: String, y: Double) => toNum(x) == y
    case (x: Boolean, _) => looseEq(toNum(x), b)
    case (_, y: Boolean) => looseEq(a, toNum(y))
    case (x: Double, _) => x == toNum(toPrimitive(b))
    case (_, y: Double) => toNum(toPrimitive(a)) == y
    case (x: String, _) => x == toStr(toPrimitive(b))
    case (_, y: String) => toStr(toPrimitive(a)) == y
    case _ => a.asInstanceOf[AnyRef] eq b.asInstanceOf[AnyRef]
  }

  def toPrimitive(v: Any): Any = v match {
    case _: JsObject | _: JsArray => toStr(v)
    case other => other
  }

  def strictEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) => x == y
    case (x: String, y: String) => x == y
    case (x: Boolean, y: Boolean) => x == y
    case (null, null) => true
    case (JsUndefined, JsUndefined) => true
    case _ => (a, b) match {
      case (x: AnyRef, y: AnyRef) => x eq y
      case _ => false
    }
  }

  // ---- JVM export / import ----

  /** JS value → plain JVM (String, Long/Double, Boolean, null,
    * java.util.LinkedHashMap, java.util.ArrayList).
    */
  def export(v: Any): Any = v match {
    case d: Double => if (d == d.toLong && math.abs(d) < 9.007199254740992e15)
      d.toLong else d
    case s: String => s
    case b: Boolean => b
    case null => null
    case JsUndefined => null
    case a: JsArray =>
      val l = new java.util.ArrayList[Any](a.elems.size)
      a.elems.foreach(e => l.add(export(e)))
      l
    case o: JsObject =>
      val m = new java.util.LinkedHashMap[String, Any]
      o.fields.foreach { case (k, fv) => m.put(k, export(fv)) }
      m
    case other => toStr(other)
  }

  /** Plain JVM (jackson-shaped) → JS value. */
  def importValue(v: Any): Any = v match {
    case n: java.lang.Integer => n.doubleValue()
    case n: java.lang.Long => n.doubleValue()
    case n: java.lang.Double => n.doubleValue()
    case n: java.lang.Float => n.doubleValue()
    case n: java.math.BigDecimal => n.doubleValue()
    case n: java.math.BigInteger => n.doubleValue()
    case s: String => s
    case b: java.lang.Boolean => b.booleanValue()
    case null => null
    case l: java.util.List[_] =>
      val a = new JsArray
      l.forEach(e => a.elems += importValue(e))
      a
    case m: java.util.Map[_, _] =>
      val o = new JsObject
      m.forEach((k, mv) => o.set(String.valueOf(k), importValue(mv)))
      o
    case m: scala.collection.Map[_, _] =>
      val o = new JsObject
      m.foreach { case (k, mv) => o.set(String.valueOf(k), importValue(mv)) }
      o
    case l: scala.collection.Seq[_] =>
      val a = new JsArray
      l.foreach(e => a.elems += importValue(e))
      a
    case other => toStr(other)
  }

  // ---- JSON ----

  def jsonStringify(v: Any, indent: String = ""): String = {
    val sb = new StringBuilder
    def write(v: Any, depth: Int): Boolean = v match {
      case JsUndefined | _: JsFunction | _: HostFunc => false
      case null => sb.append("null"); true
      case d: Double =>
        if (d.isNaN || d.isInfinite) sb.append("null")
        else sb.append(numToString(d))
        true
      case b: Boolean => sb.append(if (b) "true" else "false"); true
      case s: String => writeJsonString(sb, s); true
      case a: JsArray =>
        sb.append('[')
        var first = true
        a.elems.foreach { e =>
          if (!first) sb.append(',')
          newlinePad(depth + 1)
          if (!write(e, depth + 1)) sb.append("null")
          first = false
        }
        if (a.elems.nonEmpty) newlinePad(depth)
        sb.append(']'); true
      case o: JsObject =>
        sb.append('{')
        var first = true
        o.fields.foreach { case (k, fv) =>
          fv match {
            case JsUndefined | _: JsFunction | _: HostFunc => ()
            case _ =>
              if (!first) sb.append(',')
              newlinePad(depth + 1)
              writeJsonString(sb, k)
              sb.append(':')
              if (indent.nonEmpty) sb.append(' ')
              write(fv, depth + 1)
              first = false
          }
        }
        if (!first) newlinePad(depth)
        sb.append('}'); true
      case r: JsRegex => sb.append("{}"); true
      case other => writeJsonString(sb, toStr(other)); true
    }
    def newlinePad(depth: Int): Unit =
      if (indent.nonEmpty) { sb.append('\n'); sb.append(indent * depth) }
    if (!write(v, 0)) "undefined" else sb.toString
  }

  private def writeJsonString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
