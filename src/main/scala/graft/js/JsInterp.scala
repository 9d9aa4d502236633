package graft.js

import scala.collection.mutable

import JsAst._
import JsRuntime._

/** Tree-walking evaluator for the ES5-subset engine.
  *
  * One `JsInterp` is a VM: globals persist across [[run]] calls — the
  * same pooled-runtime contract as the reference's `javascript`
  * processor (processors/javascript.adoc: "global state created by
  * your programs will outlive individual invocations").
  */
final class JsInterp(hostGlobals: Map[String, Any] = Map.empty,
                     modules: Map[String, String] = Map.empty) {

  private val global = new Env(null, JsUndefined)
  private val moduleCache = mutable.HashMap.empty[String, Any]
  Builtins.install(global, this)
  hostGlobals.foreach { case (k, v) => global.declare(k, v) }
  global.declare("require", new HostFunc("require", (_, args) =>
    requireModule(toStr(args.headOption.getOrElse(JsUndefined)))))

  // ---- control-flow signals ----
  // stackless: a per-return fillInStackTrace would dominate the
  // tree-walk cost (every function call unwinds through one of these)
  private case class ReturnSig(v: Any) extends RuntimeException(
    null, null, false, false)
  private object BreakSig extends RuntimeException(null, null, false, false)
  private object ContinueSig extends RuntimeException(null, null, false, false)

  /** Run a program against the persistent global scope. */
  def run(prog: Program): Any = execBlock(prog.stmts, global)

  def globalLookup(name: String): Any = global.lookup(name)

  def runSource(src: String): Any = run(JsParser.parse(src))

  private def requireModule(name: String): Any =
    moduleCache.getOrElseUpdate(name, {
      val src = modules.getOrElse(name,
        modules.getOrElse(name + ".js",
          throwError("Error", s"Cannot find module '$name'")))
      val env = new Env(global, JsUndefined)
      val moduleObj = new JsObject
      val exportsObj = new JsObject
      moduleObj.set("exports", exportsObj)
      env.declare("module", moduleObj)
      env.declare("exports", exportsObj)
      execBlock(JsParser.parse(src).stmts, env)
      moduleObj.get("exports")
    })

  private def execBlock(stmts: Seq[Stmt], env: Env): Any = {
    // hoist function declarations
    stmts.foreach {
      case FuncDecl(name, params, body) =>
        env.declare(name, new JsFunction(name, params, body, None, env,
          arrow = false))
      case _ => ()
    }
    var last: Any = JsUndefined
    stmts.foreach {
      case _: FuncDecl => ()
      case s => last = exec(s, env)
    }
    last
  }

  private def exec(s: Stmt, env: Env): Any = s match {
    case EmptyStmt => JsUndefined
    case ExprStmt(e) => eval(e, env)
    case VarDecl(_, decls) =>
      decls.foreach { case (name, init) =>
        env.declare(name, init.map(eval(_, env)).getOrElse(JsUndefined))
      }
      JsUndefined
    case FuncDecl(name, params, body) =>
      env.declare(name, new JsFunction(name, params, body, None, env,
        arrow = false))
      JsUndefined
    // a Block scopes itself; bare single-statement bodies cannot
    // declare, so no extra Env per branch/iteration
    case Block(stmts) => execBlock(stmts, new Env(env, env.thisV))
    case If(test, cons, alt) =>
      if (truthy(eval(test, env))) exec(cons, env)
      else alt.map(exec(_, env)).getOrElse(JsUndefined)
    case While(test, body) =>
      while (truthy(eval(test, env))) {
        try exec(body, env)
        catch {
          case ContinueSig => ()
          case BreakSig => return JsUndefined
        }
      }
      JsUndefined
    case DoWhile(body, test) =>
      var go = true
      while (go) {
        try exec(body, env)
        catch {
          case ContinueSig => ()
          case BreakSig => return JsUndefined
        }
        go = truthy(eval(test, env))
      }
      JsUndefined
    case For(init, test, update, body) =>
      val loopEnv = new Env(env, env.thisV)
      init.foreach(exec(_, loopEnv))
      while (test.forall(t => truthy(eval(t, loopEnv)))) {
        try exec(body, loopEnv)
        catch {
          case ContinueSig => ()
          case BreakSig => return JsUndefined
        }
        update.foreach(eval(_, loopEnv))
      }
      JsUndefined
    case ForIn(_, name, objE, body, of) =>
      val target = eval(objE, env)
      val items: Seq[Any] =
        if (of) target match {
          case a: JsArray => a.elems.toSeq
          case s: String => s.map(_.toString)
          case o: JsObject => throwError("TypeError", "object is not iterable")
          case _ => Nil
        } else target match {
          case o: JsObject => o.fields.keys.toSeq
          case a: JsArray => a.elems.indices.map(i => i.toString)
          case s: String => s.indices.map(_.toString)
          case _ => Nil
        }
      items.foreach { item =>
        val iterEnv = new Env(env, env.thisV)
        iterEnv.declare(name, item)
        try exec(body, iterEnv)
        catch {
          case ContinueSig => ()
          case BreakSig => return JsUndefined
        }
      }
      JsUndefined
    case Switch(disc, cases) =>
      val v = eval(disc, env)
      val switchEnv = new Env(env, env.thisV)
      var matched = false
      try {
        cases.foreach { c =>
          if (!matched && c.test.exists(t => strictEq(eval(t, switchEnv), v)))
            matched = true
          if (matched) c.body.foreach(exec(_, switchEnv))
        }
        if (!matched) {
          val defIdx = cases.indexWhere(_.test.isEmpty)
          if (defIdx >= 0)
            cases.drop(defIdx).foreach(_.body.foreach(exec(_, switchEnv)))
        }
      } catch { case BreakSig => () }
      JsUndefined
    case BreakStmt => throw BreakSig
    case ContinueStmt => throw ContinueSig
    case Return(v) => throw ReturnSig(v.map(eval(_, env)).getOrElse(JsUndefined))
    case Throw(v) => throw new JsError(eval(v, env))
    case Try(blockStmts, catchParam, catchBlock, finallyBlock) =>
      try {
        try execBlock(blockStmts, new Env(env, env.thisV))
        catch {
          case e: JsError if catchBlock.isDefined =>
            val cEnv = new Env(env, env.thisV)
            catchParam.foreach(p => cEnv.declare(p, e.value))
            execBlock(catchBlock.get, cEnv)
        }
      } finally {
        finallyBlock.foreach(execBlock(_, new Env(env, env.thisV)))
      }
  }

  // ---- expressions ----

  def eval(e: Expr, env: Env): Any = e match {
    case NumLit(v) => v
    case StrLit(v) => v
    case BoolLit(v) => v
    case NullLit => null
    case UndefinedLit => JsUndefined
    case RegexLit(src, flags) => new JsRegex(src, flags)
    case TemplateLit(parts, exprs) =>
      val sb = new StringBuilder(parts.head)
      exprs.zip(parts.tail).foreach { case (ex, lit) =>
        sb.append(toStr(eval(ex, env))); sb.append(lit)
      }
      sb.toString
    case Ident(name) => env.lookup(name)
    case ThisExpr => env.thisV
    case ArrayLit(elems) =>
      val a = new JsArray
      elems.foreach {
        case Unary("...", inner) => eval(inner, env) match {
          case arr: JsArray => a.elems ++= arr.elems
          case s: String => a.elems ++= s.map(_.toString)
          case other => a.elems += other
        }
        case el => a.elems += eval(el, env)
      }
      a
    case ObjectLit(props) =>
      val o = new JsObject
      props.foreach {
        case Prop("...", None, value) => eval(value, env) match {
          case src: JsObject => src.fields.foreach { case (k, v) => o.set(k, v) }
          case _ => ()
        }
        case Prop(_, Some(keyE), value) =>
          o.set(toStr(eval(keyE, env)), eval(value, env))
        case Prop(key, None, value) => o.set(key, eval(value, env))
      }
      o
    case FuncExpr(name, params, body, arrow, exprBody) =>
      new JsFunction(name.getOrElse(""), params, body, exprBody, env, arrow)
    case Unary(op, operand) => op match {
      case "!" => !truthy(eval(operand, env))
      case "-" => -toNum(eval(operand, env))
      case "+" => toNum(eval(operand, env))
      case "~" => (~toInt32(eval(operand, env))).toDouble
      case "void" => eval(operand, env); JsUndefined
      case "typeof" => operand match {
        case Ident(n) if !env.has(n) => "undefined"
        case _ => typeOf(eval(operand, env))
      }
      case "delete" => operand match {
        case Member(objE, prop) => eval(objE, env) match {
          case o: JsObject => o.delete(prop); true
          case _ => true
        }
        case Index(objE, idxE) =>
          val obj = eval(objE, env)
          val idx = eval(idxE, env)
          obj match {
            case o: JsObject => o.delete(toStr(idx)); true
            case a: JsArray =>
              val i = toNum(idx).toInt
              if (i >= 0 && i < a.elems.size) a.elems(i) = JsUndefined
              true
            case _ => true
          }
        case _ => true
      }
      case "..." => eval(operand, env) // handled by callers
    }
    case Update(op, operand, prefix) =>
      val old = toNum(evalRef(operand, env))
      val nv = if (op == "++") old + 1 else old - 1
      assignTo(operand, nv, env)
      if (prefix) nv else old
    case Binary(op, l, r) => binaryOp(op, eval(l, env), eval(r, env))
    case Logical(op, l, r) =>
      val lv = eval(l, env)
      op match {
        case "&&" => if (truthy(lv)) eval(r, env) else lv
        case "||" => if (truthy(lv)) lv else eval(r, env)
        case "??" => if (lv == null || lv == JsUndefined) eval(r, env) else lv
      }
    case Cond(test, cons, alt) =>
      if (truthy(eval(test, env))) eval(cons, env) else eval(alt, env)
    case Assign(op, target, valueE) =>
      val v =
        if (op == "=") eval(valueE, env)
        else binaryOp(op.dropRight(1), evalRef(target, env), eval(valueE, env))
      assignTo(target, v, env)
      v
    case Member(objE, prop) => getProp(eval(objE, env), prop)
    case Index(objE, idxE) =>
      val obj = eval(objE, env)
      val idx = eval(idxE, env)
      obj match {
        case a: JsArray =>
          idx match {
            case d: Double if d == d.toInt =>
              val i = d.toInt
              if (i >= 0 && i < a.elems.size) a.elems(i) else JsUndefined
            case _ => getProp(obj, toStr(idx))
          }
        case s: String =>
          idx match {
            case d: Double if d == d.toInt =>
              val i = d.toInt
              if (i >= 0 && i < s.length) s.charAt(i).toString else JsUndefined
            case _ => getProp(obj, toStr(idx))
          }
        case _ => getProp(obj, toStr(idx))
      }
    case Call(callee, args) => evalCall(callee, args, env)
    case NewExpr(calleeE, argEs) =>
      val ctor = eval(calleeE, env)
      val args = argEs.map(eval(_, env))
      construct(ctor, args, calleeE)
    case Seq2(l, r) => eval(l, env); eval(r, env)
  }

  private def evalRef(e: Expr, env: Env): Any = e match {
    case Ident(n) => if (env.has(n)) env.lookup(n) else JsUndefined
    case other => eval(other, env)
  }

  private def construct(ctor: Any, args: Seq[Any], calleeE: Expr): Any =
    ctor match {
      case f: JsFunction =>
        val obj = new JsObject
        calleeE match {
          case Ident(n) => obj.className = n
          case _ => ()
        }
        callFunction(f, obj, args) match {
          case r: JsObject => r
          case r: JsArray => r
          case _ => obj
        }
      case h: HostFunc => h.fn(JsUndefined, args) // Error(), RegExp(), …
      case other =>
        throwError("TypeError", s"${toStr(other)} is not a constructor")
    }

  private def evalCall(callee: Expr, argEs: Seq[Expr], env: Env): Any = {
    val args = argEs.flatMap {
      case Unary("...", inner) => eval(inner, env) match {
        case a: JsArray => a.elems.toSeq
        case s: String => s.map(_.toString)
        case other => Seq(other)
      }
      case a => Seq(eval(a, env))
    }
    callee match {
      case Member(objE, prop) =>
        val obj = eval(objE, env)
        callMethod(obj, prop, args)
      case Index(objE, idxE) =>
        val obj = eval(objE, env)
        callMethod(obj, toStr(eval(idxE, env)), args)
      case _ =>
        callValue(eval(callee, env), JsUndefined, args)
    }
  }

  def callMethod(obj: Any, prop: String, args: Seq[Any]): Any = obj match {
    case o: JsObject if o.has(prop) => callValue(o.get(prop), o, args)
    case _ => Builtins.invoke(this, obj, prop, args)
  }

  def callValue(fn: Any, thisV: Any, args: Seq[Any]): Any = fn match {
    case f: JsFunction => callFunction(f, thisV, args)
    case h: HostFunc => h.fn(thisV, args)
    case b: BoundFunc => callValue(b.fn, b.target, b.boundArgs ++ args)
    case other =>
      throwError("TypeError", s"${toStr(other)} is not a function")
  }

  def callFunction(f: JsFunction, thisV: Any, args: Seq[Any]): Any = {
    val callThis = if (f.arrow) f.closure.thisV else thisV
    val env = new Env(f.closure, callThis)
    var i = 0
    f.params.foreach { p =>
      if (p.rest) {
        val a = new JsArray
        a.elems ++= args.drop(i)
        env.declare(p.name, a)
      } else {
        val v = args.lift(i) match {
          case Some(JsUndefined) | None =>
            p.default.map(eval(_, env)).getOrElse(JsUndefined)
          case Some(x) => x
        }
        env.declare(p.name, v)
        i += 1
      }
    }
    if (!f.arrow) {
      val argsArr = new JsArray
      argsArr.elems ++= args
      env.declare("arguments", argsArr)
    }
    f.exprBody match {
      case Some(e) => eval(e, env)
      case None =>
        try { execBlock(f.body, env); JsUndefined }
        catch { case ReturnSig(v) => v }
    }
  }

  def getProp(obj: Any, prop: String): Any = obj match {
    case o: JsObject =>
      if (o.has(prop)) o.get(prop)
      else Builtins.property(this, obj, prop)
    case a: JsArray =>
      if (prop == "length") a.elems.size.toDouble
      else prop.toIntOption match {
        case Some(i) if i >= 0 && i < a.elems.size => a.elems(i)
        case _ => Builtins.property(this, obj, prop)
      }
    case s: String =>
      if (prop == "length") s.length.toDouble
      else prop.toIntOption match {
        case Some(i) if i >= 0 && i < s.length => s.charAt(i).toString
        case _ => Builtins.property(this, obj, prop)
      }
    case null =>
      throwError("TypeError", s"Cannot read properties of null (reading '$prop')")
    case JsUndefined =>
      throwError("TypeError",
        s"Cannot read properties of undefined (reading '$prop')")
    case _ => Builtins.property(this, obj, prop)
  }

  private def assignTo(target: Expr, v: Any, env: Env): Unit = target match {
    case Ident(n) => env.assign(n, v)
    case Member(objE, prop) => eval(objE, env) match {
      case o: JsObject => o.set(prop, v)
      case a: JsArray if prop == "length" =>
        val nl = toNum(v).toInt
        if (nl < a.elems.size) a.elems.remove(nl, a.elems.size - nl)
        else while (a.elems.size < nl) a.elems += JsUndefined
      case _ => ()
    }
    case Index(objE, idxE) =>
      val obj = eval(objE, env)
      val idx = eval(idxE, env)
      obj match {
        case a: JsArray =>
          val i = toNum(idx).toInt
          if (i >= 0) {
            while (a.elems.size <= i) a.elems += JsUndefined
            a.elems(i) = v
          }
        case o: JsObject => o.set(toStr(idx), v)
        case _ => ()
      }
    case _ => throwError("SyntaxError", "invalid assignment target")
  }

  private def binaryOp(op: String, a: Any, b: Any): Any = op match {
    case "+" =>
      val pa = toPrimitive(a); val pb = toPrimitive(b)
      (pa, pb) match {
        case (s: String, _) => s + toStr(pb)
        case (_, s: String) => toStr(pa) + s
        case _ => toNum(pa) + toNum(pb)
      }
    case "-" => toNum(a) - toNum(b)
    case "*" => toNum(a) * toNum(b)
    case "/" => toNum(a) / toNum(b)
    case "%" => toNum(a) % toNum(b)
    case "**" => math.pow(toNum(a), toNum(b))
    case "==" => looseEq(a, b)
    case "!=" => !looseEq(a, b)
    case "===" => strictEq(a, b)
    case "!==" => !strictEq(a, b)
    case "<" | ">" | "<=" | ">=" =>
      val pa = toPrimitive(a); val pb = toPrimitive(b)
      (pa, pb) match {
        case (x: String, y: String) => op match {
          case "<" => x < y
          case ">" => x > y
          case "<=" => x <= y
          case _ => x >= y
        }
        case _ =>
          val x = toNum(pa); val y = toNum(pb)
          if (x.isNaN || y.isNaN) false
          else op match {
            case "<" => x < y
            case ">" => x > y
            case "<=" => x <= y
            case _ => x >= y
          }
      }
    case "&" => (toInt32(a) & toInt32(b)).toDouble
    case "|" => (toInt32(a) | toInt32(b)).toDouble
    case "^" => (toInt32(a) ^ toInt32(b)).toDouble
    case "<<" => (toInt32(a) << (toInt32(b) & 31)).toDouble
    case ">>" => (toInt32(a) >> (toInt32(b) & 31)).toDouble
    case ">>>" => (toUint32(a) >>> (toInt32(b) & 31)).toDouble
    case "instanceof" => (a, b) match {
      case (o: JsObject, h: HostFunc) =>
        h.name == o.className || (h.name == "Error" && o.className.endsWith("Error")) ||
          (h.name == "Object")
      case (o: JsObject, f: JsFunction) => o.className == f.name
      case (_: JsArray, h: HostFunc) => h.name == "Array" || h.name == "Object"
      case _ => false
    }
    case "in" => (b: @unchecked) match {
      case o: JsObject => o.has(toStr(a))
      case arr: JsArray =>
        val i = toNum(a).toInt
        i >= 0 && i < arr.elems.size
      case _ => throwError("TypeError",
        "Cannot use 'in' operator to search in non-object")
    }
    case other => throwError("SyntaxError", s"unsupported operator $other")
  }
}
