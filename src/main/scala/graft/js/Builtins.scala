package graft.js

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

import JsRuntime._

/** Global objects + builtin method dispatch for the ES5-subset engine.
  * Covers the surface the reference's `javascript` processor corpus
  * exercises (String/Array/Object/JSON/Math/Number/RegExp/Error,
  * console) — unknown methods raise TypeError like a real engine.
  */
object Builtins {

  private val mapper = new ObjectMapper()

  /** Pluggable console sink (the processor routes this to its logger). */
  @volatile var consoleSink: String => Unit =
    s => System.err.println(s"[js console] $s")

  def install(g: Env, interp: JsInterp): Unit = {
    g.declare("undefined", JsUndefined)
    g.declare("NaN", Double.NaN)
    g.declare("Infinity", Double.PositiveInfinity)
    g.declare("globalThis", JsUndefined)

    // Error constructors (callable with and without `new`)
    Seq("Error", "TypeError", "RangeError", "SyntaxError",
        "ReferenceError", "EvalError").foreach { name =>
      g.declare(name, new HostFunc(name, (_, args) => {
        val msg = args.headOption.map(toStr).getOrElse("")
        newError(name, msg)
      }))
    }

    g.declare("parseInt", new HostFunc("parseInt", (_, args) =>
      parseIntImpl(toStr(args.headOption.getOrElse(JsUndefined)),
        args.lift(1).map(a => toNum(a).toInt).filter(_ != 0).getOrElse(10))))
    g.declare("parseFloat", new HostFunc("parseFloat", (_, args) =>
      parseFloatImpl(toStr(args.headOption.getOrElse(JsUndefined)))))
    g.declare("isNaN", new HostFunc("isNaN", (_, args) =>
      toNum(args.headOption.getOrElse(JsUndefined)).isNaN))
    g.declare("isFinite", new HostFunc("isFinite", (_, args) => {
      val d = toNum(args.headOption.getOrElse(JsUndefined))
      !d.isNaN && !d.isInfinite
    }))
    g.declare("encodeURIComponent", new HostFunc("encodeURIComponent",
      (_, args) => java.net.URLEncoder.encode(
        toStr(args.headOption.getOrElse(JsUndefined)), "UTF-8")
        .replace("+", "%20")))
    g.declare("decodeURIComponent", new HostFunc("decodeURIComponent",
      (_, args) => java.net.URLDecoder.decode(
        toStr(args.headOption.getOrElse(JsUndefined)), "UTF-8")))

    g.declare("String", new HostFunc("String", (_, args) =>
      args.headOption.map(toStr).getOrElse("")))
    g.declare("Boolean", new HostFunc("Boolean", (_, args) =>
      truthy(args.headOption.getOrElse(JsUndefined))))
    g.declare("RegExp", new HostFunc("RegExp", (_, args) =>
      new JsRegex(toStr(args.headOption.getOrElse("")),
        args.lift(1).map(toStr).getOrElse(""))))

    g.declare("Number", new HostFunc("Number", (_, args) =>
      args.headOption.map(toNum).getOrElse(0.0)))
    val numberObj = hostObj(
      "parseInt" -> ((_, args: Seq[Any]) =>
        parseIntImpl(toStr(args.headOption.getOrElse(JsUndefined)),
          args.lift(1).map(a => toNum(a).toInt).filter(_ != 0).getOrElse(10))),
      "parseFloat" -> ((_, args: Seq[Any]) =>
        parseFloatImpl(toStr(args.headOption.getOrElse(JsUndefined)))),
      "isNaN" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(d: Double) => d.isNaN
        case _ => false
      }),
      "isFinite" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(d: Double) => !d.isNaN && !d.isInfinite
        case _ => false
      }),
      "isInteger" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(d: Double) => !d.isNaN && !d.isInfinite && d == d.toLong
        case _ => false
      }))
    numberObj.set("MAX_SAFE_INTEGER", 9007199254740991.0)
    numberObj.set("MIN_SAFE_INTEGER", -9007199254740991.0)
    numberObj.set("EPSILON", 2.220446049250313e-16)
    g.declare("__NumberStatics", numberObj)

    val mathObj = hostObj(
      "abs" -> num1(math.abs),
      "floor" -> num1(math.floor),
      "ceil" -> num1(math.ceil),
      "round" -> num1(d => math.floor(d + 0.5)),
      "trunc" -> num1(d => if (d < 0) math.ceil(d) else math.floor(d)),
      "sqrt" -> num1(math.sqrt),
      "cbrt" -> num1(math.cbrt),
      "exp" -> num1(math.exp),
      "log" -> num1(math.log),
      "log2" -> num1(d => math.log(d) / math.log(2)),
      "log10" -> num1(math.log10),
      "sin" -> num1(math.sin), "cos" -> num1(math.cos),
      "tan" -> num1(math.tan), "atan" -> num1(math.atan),
      "sign" -> num1(math.signum),
      "pow" -> ((_, args: Seq[Any]) =>
        math.pow(argNum(args, 0), argNum(args, 1))),
      "atan2" -> ((_, args: Seq[Any]) =>
        math.atan2(argNum(args, 0), argNum(args, 1))),
      "min" -> ((_, args: Seq[Any]) =>
        if (args.isEmpty) Double.PositiveInfinity else args.map(toNum).min),
      "max" -> ((_, args: Seq[Any]) =>
        if (args.isEmpty) Double.NegativeInfinity else args.map(toNum).max),
      "hypot" -> ((_, args: Seq[Any]) =>
        math.sqrt(args.map(a => { val d = toNum(a); d * d }).sum)),
      "random" -> ((_, _: Seq[Any]) => mathRandom.nextDouble()))
    mathObj.set("PI", math.Pi)
    mathObj.set("E", math.E)
    g.declare("Math", mathObj)

    val jsonObj = hostObj(
      "stringify" -> ((_, args: Seq[Any]) => {
        val indent = args.lift(2) match {
          case Some(d: Double) => " " * math.min(10, math.max(0, d.toInt))
          case Some(s: String) => s
          case _ => ""
        }
        args.headOption.getOrElse(JsUndefined) match {
          case JsUndefined => JsUndefined
          case v => jsonStringify(v, indent)
        }
      }),
      "parse" -> ((_, args: Seq[Any]) => {
        val s = toStr(args.headOption.getOrElse(JsUndefined))
        try importValue(mapper.readValue(s, classOf[Object]))
        catch {
          case e: Exception =>
            throwError("SyntaxError", s"JSON.parse: ${e.getMessage}")
        }
      }))
    g.declare("JSON", jsonObj)

    val objectObj = hostObj(
      "keys" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(o: JsObject) =>
          val a = new JsArray; a.elems ++= o.fields.keys; a
        case Some(arr: JsArray) =>
          val a = new JsArray
          a.elems ++= arr.elems.indices.map(i => i.toString); a
        case _ => new JsArray
      }),
      "values" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(o: JsObject) =>
          val a = new JsArray; a.elems ++= o.fields.values; a
        case Some(arr: JsArray) =>
          val a = new JsArray; a.elems ++= arr.elems; a
        case _ => new JsArray
      }),
      "entries" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(o: JsObject) =>
          val a = new JsArray
          o.fields.foreach { case (k, v) =>
            val pair = new JsArray
            pair.elems += k; pair.elems += v
            a.elems += pair
          }
          a
        case _ => new JsArray
      }),
      "assign" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(target: JsObject) =>
          args.tail.foreach {
            case src: JsObject =>
              src.fields.foreach { case (k, v) => target.set(k, v) }
            case _ => ()
          }
          target
        case other => other.getOrElse(JsUndefined)
      }),
      "fromEntries" -> ((_, args: Seq[Any]) => {
        val o = new JsObject
        args.headOption match {
          case Some(a: JsArray) => a.elems.foreach {
            case pair: JsArray if pair.elems.size >= 2 =>
              o.set(toStr(pair.elems(0)), pair.elems(1))
            case _ => ()
          }
          case _ => ()
        }
        o
      }),
      "freeze" -> ((_, args: Seq[Any]) => args.headOption.getOrElse(JsUndefined)),
      "getOwnPropertyNames" -> ((_, args: Seq[Any]) => args.headOption match {
        case Some(o: JsObject) =>
          val a = new JsArray; a.elems ++= o.fields.keys; a
        case _ => new JsArray
      }))
    g.declare("Object", objectObj)

    val arrayCtor = new HostFunc("Array", (_, args) => {
      val a = new JsArray
      args match {
        case Seq(d: Double) if d == d.toInt && d >= 0 =>
          (0 until d.toInt).foreach(_ => a.elems += JsUndefined)
        case _ => a.elems ++= args
      }
      a
    })
    g.declare("Array", arrayCtor)
    // Array.isArray / Array.from live on a side object consulted by
    // property(); HostFunc carries no fields, so getProp special-cases
    // the name "Array" via arrayStatics.
    g.declare("__ArrayStatics", arrayStatics(interp))

    val dateObj = hostObj(
      "now" -> ((_, _: Seq[Any]) => System.currentTimeMillis().toDouble))
    g.declare("Date", dateObj)

    val consoleObj = hostObj(
      "log" -> ((_, args: Seq[Any]) => {
        consoleSink(args.map(a => a match {
          case _: JsObject | _: JsArray => jsonStringify(a)
          case _ => toStr(a)
        }).mkString(" ")); JsUndefined
      }))
    consoleObj.set("warn", consoleObj.get("log"))
    consoleObj.set("error", consoleObj.get("log"))
    consoleObj.set("info", consoleObj.get("log"))
    consoleObj.set("debug", consoleObj.get("log"))
    g.declare("console", consoleObj)
  }

  /** Deterministic per-VM PRNG (documented: Math.random is seeded per
    * runtime so distributed runs are reproducible).
    */
  private val mathRandom = new java.util.Random(0x5deece66dL)

  private def num1(f: Double => Double): (Any, Seq[Any]) => Any =
    (_, args) => f(toNum(args.headOption.getOrElse(JsUndefined)))
  private def argNum(args: Seq[Any], i: Int): Double =
    toNum(args.lift(i).getOrElse(JsUndefined))

  private def hostObj(entries: (String, (Any, Seq[Any]) => Any)*): JsObject = {
    val o = new JsObject
    entries.foreach { case (n, f) => o.set(n, new HostFunc(n, f)) }
    o
  }

  private def arrayStatics(interp: JsInterp): JsObject = hostObj(
    "isArray" -> ((_, args: Seq[Any]) =>
      args.headOption.exists(_.isInstanceOf[JsArray])),
    "from" -> ((_, args: Seq[Any]) => {
      val a = new JsArray
      args.headOption match {
        case Some(src: JsArray) => a.elems ++= src.elems
        case Some(s: String) => a.elems ++= s.map(_.toString)
        case Some(o: JsObject) if o.has("length") =>
          val n = toNum(o.get("length")).toInt
          (0 until n).foreach(i => a.elems += o.get(i.toString))
        case _ => ()
      }
      args.lift(1) match {
        case Some(fn) =>
          val mapped = a.elems.zipWithIndex.map { case (e, i) =>
            interp.callValue(fn, JsUndefined, Seq(e, i.toDouble))
          }
          a.elems.clear(); a.elems ++= mapped
        case None => ()
      }
      a
    }))

  // ---- method + property dispatch on primitives/arrays/regex ----

  private val stringMethods = Set("charAt", "charCodeAt", "codePointAt",
    "indexOf", "lastIndexOf", "includes", "startsWith", "endsWith",
    "slice", "substring", "substr", "toUpperCase", "toLowerCase",
    "trim", "trimStart", "trimEnd", "split", "replace", "replaceAll",
    "match", "concat", "repeat", "padStart", "padEnd", "toString",
    "valueOf", "localeCompare", "at", "search")
  private val arrayMethods = Set("push", "pop", "shift", "unshift",
    "slice", "splice", "concat", "join", "indexOf", "lastIndexOf",
    "includes", "map", "filter", "reduce", "reduceRight", "forEach",
    "find", "findIndex", "some", "every", "sort", "reverse", "flat",
    "flatMap", "fill", "at", "toString", "keys", "values", "entries")
  private val numberMethods = Set("toString", "toFixed", "valueOf",
    "toPrecision")
  private val regexMethods = Set("test", "exec", "toString")
  private val funcMethods = Set("call", "apply", "bind")
  private val objectMethods = Set("hasOwnProperty", "toString", "valueOf")

  /** Non-call property access for builtin methods: returns a bound
    * HostFunc so methods can be passed as values, or undefined.
    */
  def property(interp: JsInterp, target: Any, name: String): Any = {
    val known = target match {
      case _: String => stringMethods(name)
      case _: JsArray => arrayMethods(name)
      case _: Double => numberMethods(name)
      case _: JsRegex => regexMethods(name) ||
        name == "source" || name == "flags" || name == "global" ||
        name == "lastIndex"
      case _: JsFunction | _: HostFunc | _: BoundFunc =>
        funcMethods(name) || name == "name"
      case _: JsObject => objectMethods(name)
      case _ => false
    }
    target match {
      case r: JsRegex if name == "source" => return r.source
      case r: JsRegex if name == "flags" => return r.flags
      case r: JsRegex if name == "global" => return r.global
      case r: JsRegex if name == "lastIndex" => return r.lastIndex.toDouble
      case f: JsFunction if name == "name" => return f.name
      case f: JsFunction if name == "length" => return f.params.size.toDouble
      case h: HostFunc if name == "name" => return h.name
      case h: HostFunc if h.name == "Array" =>
        // Array.isArray / Array.from
        return interp.getProp(interp.globalLookup("__ArrayStatics"), name)
      case h: HostFunc if h.name == "Number" =>
        // Number.parseInt / isInteger / MAX_SAFE_INTEGER …
        return interp.getProp(interp.globalLookup("__NumberStatics"), name)
      case _ => ()
    }
    if (known)
      new HostFunc(name, (_, args) => invoke(interp, target, name, args))
    else JsUndefined
  }

  def invoke(interp: JsInterp, target: Any, name: String, args: Seq[Any]): Any = {
    // statics on the callable Array/Number constructors
    target match {
      case h: HostFunc if h.name == "Array" && !funcMethods(name) =>
        return interp.callMethod(interp.globalLookup("__ArrayStatics"), name, args)
      case h: HostFunc if h.name == "Number" && !funcMethods(name) =>
        return interp.callMethod(interp.globalLookup("__NumberStatics"), name, args)
      case _ => ()
    }
    def arg(i: Int): Any = args.lift(i).getOrElse(JsUndefined)
    def argS(i: Int): String = toStr(arg(i))
    def argI(i: Int, dflt: Int = 0): Int = args.lift(i) match {
      case Some(JsUndefined) | None => dflt
      case Some(v) =>
        val d = toNum(v)
        if (d.isNaN) dflt else d.toInt
    }
    def call(fn: Any, cbArgs: Seq[Any]): Any =
      interp.callValue(fn, args.lift(1).getOrElse(JsUndefined), cbArgs)

    target match {
      // ---- string ----
      case s: String => name match {
        case "charAt" =>
          val i = argI(0)
          if (i >= 0 && i < s.length) s.charAt(i).toString else ""
        case "charCodeAt" =>
          val i = argI(0)
          if (i >= 0 && i < s.length) s.charAt(i).toDouble else Double.NaN
        case "codePointAt" =>
          val i = argI(0)
          if (i >= 0 && i < s.length) s.codePointAt(i).toDouble else JsUndefined
        case "at" =>
          val i = argI(0)
          val idx = if (i < 0) s.length + i else i
          if (idx >= 0 && idx < s.length) s.charAt(idx).toString else JsUndefined
        case "indexOf" => s.indexOf(argS(0), argI(1)).toDouble
        case "lastIndexOf" => s.lastIndexOf(argS(0)).toDouble
        case "includes" => s.contains(argS(0))
        case "startsWith" => s.startsWith(argS(0), argI(1))
        case "endsWith" => args.lift(1) match {
          case Some(d: Double) => s.substring(0, math.min(d.toInt, s.length))
            .endsWith(argS(0))
          case _ => s.endsWith(argS(0))
        }
        case "slice" =>
          val (a, b) = sliceRange(s.length, args)
          if (a >= b) "" else s.substring(a, b)
        case "substring" =>
          val a = clamp(argI(0), s.length)
          val b = args.lift(1) match {
            case Some(JsUndefined) | None => s.length
            case Some(v) => clamp(toNum(v).toInt, s.length)
          }
          if (a <= b) s.substring(a, b) else s.substring(b, a)
        case "substr" =>
          val start0 = argI(0)
          val start = if (start0 < 0) math.max(0, s.length + start0) else
            math.min(start0, s.length)
          val len = args.lift(1) match {
            case Some(JsUndefined) | None => s.length - start
            case Some(v) => math.max(0, toNum(v).toInt)
          }
          s.substring(start, math.min(s.length, start + len))
        case "toUpperCase" => s.toUpperCase
        case "toLowerCase" => s.toLowerCase
        case "trim" => s.trim
        case "trimStart" => s.replaceAll("^\\s+", "")
        case "trimEnd" => s.replaceAll("\\s+$", "")
        case "concat" => s + args.map(toStr).mkString
        case "repeat" =>
          val n = argI(0)
          if (n < 0) throwError("RangeError", "Invalid count value")
          s * n
        case "padStart" =>
          val target0 = argI(0)
          val pad = args.lift(1).map(toStr).getOrElse(" ")
          padTo(s, target0, pad, start = true)
        case "padEnd" =>
          val target0 = argI(0)
          val pad = args.lift(1).map(toStr).getOrElse(" ")
          padTo(s, target0, pad, start = false)
        case "toString" | "valueOf" => s
        case "localeCompare" => s.compareTo(argS(0)).sign.toDouble
        case "split" => splitImpl(s, args)
        case "replace" => replaceImpl(interp, s, args, all = false)
        case "replaceAll" => replaceImpl(interp, s, args, all = true)
        case "match" => matchImpl(s, arg(0))
        case "search" => arg(0) match {
          case r: JsRegex =>
            val m = r.pattern.matcher(s)
            (if (m.find()) m.start() else -1).toDouble
          case other => s.indexOf(toStr(other)).toDouble
        }
        case other =>
          throwError("TypeError", s"string.$other is not a function")
      }

      // ---- number ----
      case d: Double => name match {
        case "toString" => args.lift(0) match {
          case Some(radix: Double) if radix != 10.0 =>
            java.lang.Long.toString(d.toLong, radix.toInt)
          case _ => numToString(d)
        }
        case "toFixed" =>
          val n = argI(0)
          String.format(java.util.Locale.ROOT, s"%.${n}f",
            java.lang.Double.valueOf(d))
        case "toPrecision" =>
          if (args.isEmpty) numToString(d)
          else new java.math.BigDecimal(d)
            .round(new java.math.MathContext(argI(0))).toString
        case "valueOf" => d
        case other =>
          throwError("TypeError", s"number.$other is not a function")
      }

      // ---- boolean ----
      case b: Boolean => name match {
        case "toString" => if (b) "true" else "false"
        case "valueOf" => b
        case other =>
          throwError("TypeError", s"boolean.$other is not a function")
      }

      // ---- array ----
      case a: JsArray => name match {
        case "push" => args.foreach(a.elems += _); a.elems.size.toDouble
        case "pop" =>
          if (a.elems.isEmpty) JsUndefined else a.elems.remove(a.elems.size - 1)
        case "shift" => if (a.elems.isEmpty) JsUndefined else a.elems.remove(0)
        case "unshift" =>
          a.elems.insertAll(0, args); a.elems.size.toDouble
        case "slice" =>
          val (from, until) = sliceRange(a.elems.size, args)
          val out = new JsArray
          if (from < until) out.elems ++= a.elems.slice(from, until)
          out
        case "splice" =>
          val start0 = argI(0)
          val start = if (start0 < 0) math.max(0, a.elems.size + start0)
            else math.min(start0, a.elems.size)
          val deleteCount = args.lift(1) match {
            case Some(JsUndefined) | None => a.elems.size - start
            case Some(v) =>
              math.max(0, math.min(toNum(v).toInt, a.elems.size - start))
          }
          val removed = new JsArray
          removed.elems ++= a.elems.slice(start, start + deleteCount)
          a.elems.remove(start, deleteCount)
          a.elems.insertAll(start, args.drop(2))
          removed
        case "concat" =>
          val out = new JsArray
          out.elems ++= a.elems
          args.foreach {
            case other: JsArray => out.elems ++= other.elems
            case v => out.elems += v
          }
          out
        case "join" =>
          val sep = args.headOption match {
            case Some(JsUndefined) | None => ","
            case Some(v) => toStr(v)
          }
          a.elems.map {
            case null | JsUndefined => ""
            case e => toStr(e)
          }.mkString(sep)
        case "indexOf" =>
          a.elems.indexWhere(strictEq(_, arg(0)), argI(1)).toDouble
        case "lastIndexOf" =>
          a.elems.lastIndexWhere(strictEq(_, arg(0))).toDouble
        case "includes" => a.elems.exists(strictEq(_, arg(0)))
        case "at" =>
          val i0 = argI(0)
          val i = if (i0 < 0) a.elems.size + i0 else i0
          if (i >= 0 && i < a.elems.size) a.elems(i) else JsUndefined
        case "map" =>
          val out = new JsArray
          a.elems.zipWithIndex.foreach { case (e, i) =>
            out.elems += call(arg(0), Seq(e, i.toDouble, a))
          }
          out
        case "filter" =>
          val out = new JsArray
          a.elems.zipWithIndex.foreach { case (e, i) =>
            if (truthy(call(arg(0), Seq(e, i.toDouble, a)))) out.elems += e
          }
          out
        case "forEach" =>
          a.elems.zipWithIndex.foreach { case (e, i) =>
            call(arg(0), Seq(e, i.toDouble, a))
          }
          JsUndefined
        case "reduce" =>
          var acc: Any = JsUndefined
          var start = 0
          if (args.size >= 2) acc = args(1)
          else {
            if (a.elems.isEmpty)
              throwError("TypeError", "Reduce of empty array with no initial value")
            acc = a.elems.head; start = 1
          }
          (start until a.elems.size).foreach { i =>
            acc = interp.callValue(arg(0), JsUndefined,
              Seq(acc, a.elems(i), i.toDouble, a))
          }
          acc
        case "reduceRight" =>
          var acc: Any = JsUndefined
          var start = a.elems.size - 1
          if (args.size >= 2) acc = args(1)
          else {
            if (a.elems.isEmpty)
              throwError("TypeError", "Reduce of empty array with no initial value")
            acc = a.elems.last; start = a.elems.size - 2
          }
          (start to 0 by -1).foreach { i =>
            acc = interp.callValue(arg(0), JsUndefined,
              Seq(acc, a.elems(i), i.toDouble, a))
          }
          acc
        case "find" =>
          a.elems.zipWithIndex
            .find { case (e, i) => truthy(call(arg(0), Seq(e, i.toDouble, a))) }
            .map(_._1).getOrElse(JsUndefined)
        case "findIndex" =>
          a.elems.zipWithIndex
            .indexWhere { case (e, i) =>
              truthy(call(arg(0), Seq(e, i.toDouble, a))) }.toDouble
        case "some" =>
          a.elems.zipWithIndex.exists { case (e, i) =>
            truthy(call(arg(0), Seq(e, i.toDouble, a))) }
        case "every" =>
          a.elems.zipWithIndex.forall { case (e, i) =>
            truthy(call(arg(0), Seq(e, i.toDouble, a))) }
        case "sort" =>
          val sorted = args.headOption match {
            case Some(JsUndefined) | None =>
              a.elems.sortBy(e => if (e == JsUndefined) "￿" else toStr(e))
            case Some(cmp) =>
              a.elems.sortWith { (x, y) =>
                toNum(interp.callValue(cmp, JsUndefined, Seq(x, y))) < 0
              }
          }
          a.elems.clear(); a.elems ++= sorted
          a
        case "reverse" =>
          val rev = a.elems.reverse
          a.elems.clear(); a.elems ++= rev
          a
        case "flat" =>
          val depth = args.headOption match {
            case Some(d: Double) => d.toInt
            case _ => 1
          }
          def flatten(src: Seq[Any], d: Int): Seq[Any] = src.flatMap {
            case inner: JsArray if d > 0 => flatten(inner.elems.toSeq, d - 1)
            case e => Seq(e)
          }
          val out = new JsArray
          out.elems ++= flatten(a.elems.toSeq, depth)
          out
        case "flatMap" =>
          val out = new JsArray
          a.elems.zipWithIndex.foreach { case (e, i) =>
            call(arg(0), Seq(e, i.toDouble, a)) match {
              case inner: JsArray => out.elems ++= inner.elems
              case v => out.elems += v
            }
          }
          out
        case "fill" =>
          val v = arg(0)
          val (from, until) = sliceRange(a.elems.size, args.drop(1))
          (from until until).foreach(i => a.elems(i) = v)
          a
        case "toString" => toStr(a)
        case other =>
          throwError("TypeError", s"array.$other is not a function")
      }

      // ---- regex ----
      case r: JsRegex => name match {
        case "test" => r.pattern.matcher(argS(0)).find()
        case "exec" =>
          val s = argS(0)
          val m = r.pattern.matcher(s)
          val from = if (r.global) r.lastIndex else 0
          if (from <= s.length && m.find(from)) {
            if (r.global) r.lastIndex = m.end()
            val out = new JsArray
            (0 to m.groupCount()).foreach { gi =>
              out.elems += (if (m.group(gi) == null) JsUndefined else m.group(gi))
            }
            out
          } else {
            if (r.global) r.lastIndex = 0
            null
          }
        case "toString" => s"/${r.source}/${r.flags}"
        case other =>
          throwError("TypeError", s"regexp.$other is not a function")
      }

      // ---- functions ----
      case f @ (_: JsFunction | _: HostFunc | _: BoundFunc) => name match {
        case "call" =>
          interp.callValue(f, arg(0), args.drop(1))
        case "apply" =>
          val applied = args.lift(1) match {
            case Some(a: JsArray) => a.elems.toSeq
            case _ => Nil
          }
          interp.callValue(f, arg(0), applied)
        case "bind" => new BoundFunc(arg(0), f, args.drop(1))
        case other =>
          throwError("TypeError", s"function.$other is not a function")
      }

      // ---- plain object ----
      case o: JsObject => name match {
        case "hasOwnProperty" => o.has(argS(0))
        case "toString" => toStr(o)
        case "valueOf" => o
        case other =>
          throwError("TypeError",
            s"${toStr(o)}.$other is not a function")
      }

      case null =>
        throwError("TypeError",
          s"Cannot read properties of null (reading '$name')")
      case JsUndefined =>
        throwError("TypeError",
          s"Cannot read properties of undefined (reading '$name')")
      case other =>
        throwError("TypeError", s"${toStr(other)}.$name is not a function")
    }
  }

  private def clamp(i: Int, len: Int): Int = math.max(0, math.min(i, len))

  /** slice-style [from, until) with negative indexing. */
  private def sliceRange(len: Int, args: Seq[Any]): (Int, Int) = {
    val rawA = args.headOption match {
      case Some(JsUndefined) | None => 0
      case Some(v) => toNum(v).toInt
    }
    val rawB = args.lift(1) match {
      case Some(JsUndefined) | None => len
      case Some(v) => toNum(v).toInt
    }
    val a = if (rawA < 0) math.max(0, len + rawA) else math.min(rawA, len)
    val b = if (rawB < 0) math.max(0, len + rawB) else math.min(rawB, len)
    (a, b)
  }

  private def padTo(s: String, target: Int, pad: String, start: Boolean): String = {
    if (s.length >= target || pad.isEmpty) s
    else {
      val need = target - s.length
      val sb = new StringBuilder
      while (sb.length < need) sb.append(pad)
      val padding = sb.substring(0, need)
      if (start) padding + s else s + padding
    }
  }

  private def splitImpl(s: String, args: Seq[Any]): JsArray = {
    val out = new JsArray
    val limit = args.lift(1) match {
      case Some(d: Double) => d.toInt
      case _ => Int.MaxValue
    }
    args.headOption match {
      case Some(JsUndefined) | None => out.elems += s
      case Some(r: JsRegex) =>
        out.elems ++= r.pattern.split(s, -1).take(limit)
      case Some(sep0) =>
        val sep = toStr(sep0)
        if (sep.isEmpty) out.elems ++= s.map(_.toString).take(limit)
        else {
          var rest = s
          var done = false
          while (!done && out.elems.size < limit) {
            val i = rest.indexOf(sep)
            if (i < 0) { out.elems += rest; done = true }
            else { out.elems += rest.substring(0, i); rest = rest.substring(i + sep.length) }
          }
        }
    }
    out
  }

  private def expandReplacement(template: String,
                                m: java.util.regex.Matcher): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '$' && i + 1 < template.length) {
        template.charAt(i + 1) match {
          case '$' => sb.append('$'); i += 2
          case '&' => sb.append(m.group()); i += 2
          case d if d.isDigit =>
            val gi = d - '0'
            if (gi <= m.groupCount()) {
              Option(m.group(gi)).foreach(sb.append)
              i += 2
            } else { sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def replaceImpl(interp: JsInterp, s: String, args: Seq[Any],
                          all: Boolean): String = {
    val replArg = args.lift(1).getOrElse(JsUndefined)
    def replFor(m: java.util.regex.Matcher): String = replArg match {
      case f @ (_: JsFunction | _: HostFunc | _: BoundFunc) =>
        val cbArgs = mutable.ArrayBuffer[Any](m.group())
        (1 to m.groupCount()).foreach { gi =>
          cbArgs += (if (m.group(gi) == null) JsUndefined else m.group(gi))
        }
        cbArgs += m.start().toDouble
        cbArgs += s
        toStr(interp.callValue(f, JsUndefined, cbArgs.toSeq))
      case other => expandReplacement(toStr(other), m)
    }
    args.headOption match {
      case Some(r: JsRegex) =>
        val m = r.pattern.matcher(s)
        val global = all || r.global
        val sb = new StringBuilder
        var last = 0
        var found = m.find()
        while (found) {
          sb.append(s.substring(last, m.start()))
          sb.append(replFor(m))
          last = m.end()
          if (m.end() == m.start()) { // zero-width: advance
            if (last < s.length) sb.append(s.charAt(last))
            last += 1
          }
          found = global && last <= s.length && m.find(math.max(last, m.end()))
        }
        if (last <= s.length) sb.append(s.substring(math.min(last, s.length)))
        sb.toString
      case Some(pat0) =>
        val pat = toStr(pat0)
        if (all) {
          if (pat.isEmpty) s
          else {
            val sb = new StringBuilder
            var rest = s
            var done = false
            while (!done) {
              val i = rest.indexOf(pat)
              if (i < 0) { sb.append(rest); done = true }
              else {
                sb.append(rest.substring(0, i))
                replArg match {
                  case f @ (_: JsFunction | _: HostFunc | _: BoundFunc) =>
                    sb.append(toStr(interp.callValue(f, JsUndefined,
                      Seq(pat, (s.length - rest.length + i).toDouble, s))))
                  case other => sb.append(toStr(other).replace("$&", pat))
                }
                rest = rest.substring(i + pat.length)
              }
            }
            sb.toString
          }
        } else {
          val i = s.indexOf(pat)
          if (i < 0) s
          else {
            val repl = replArg match {
              case f @ (_: JsFunction | _: HostFunc | _: BoundFunc) =>
                toStr(interp.callValue(f, JsUndefined,
                  Seq(pat, i.toDouble, s)))
              case other => toStr(other).replace("$&", pat)
            }
            s.substring(0, i) + repl + s.substring(i + pat.length)
          }
        }
      case None => s
    }
  }

  private def matchImpl(s: String, pat: Any): Any = pat match {
    case r: JsRegex if r.global =>
      val m = r.pattern.matcher(s)
      val out = new JsArray
      while (m.find()) out.elems += m.group()
      if (out.elems.isEmpty) null else out
    case r: JsRegex =>
      val m = r.pattern.matcher(s)
      if (m.find()) {
        val out = new JsArray
        (0 to m.groupCount()).foreach { gi =>
          out.elems += (if (m.group(gi) == null) JsUndefined else m.group(gi))
        }
        out
      } else null
    case other => matchImpl(s, new JsRegex(
      java.util.regex.Pattern.quote(toStr(other)), ""))
  }

  private def parseIntImpl(s0: String, radix: Int): Double = {
    var s = s0.trim
    var sign = 1
    if (s.startsWith("-")) { sign = -1; s = s.substring(1) }
    else if (s.startsWith("+")) s = s.substring(1)
    var r = radix
    if ((r == 16 || r == 10) && (s.startsWith("0x") || s.startsWith("0X"))) {
      s = s.substring(2); r = 16
    }
    val digits = s.takeWhile(c => Character.digit(c, r) >= 0)
    if (digits.isEmpty) Double.NaN
    else sign * java.lang.Long.parseLong(digits, r).toDouble
  }

  private def parseFloatImpl(s0: String): Double = {
    val s = s0.trim
    val m = java.util.regex.Pattern
      .compile("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?").matcher(s)
    if (m.find()) m.group().toDouble else Double.NaN
  }
}
