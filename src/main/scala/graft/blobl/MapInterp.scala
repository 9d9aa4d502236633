package graft.blobl

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import Ast._

/** Row-kernel INTERPRETER for SELF-RECURSIVE named maps — the
  * reference's tree-walk idiom (config/test/bloblang/walk_json.yaml:
  * `map unescape_values { root = match { … this.map_each(
  * this.value.apply("unescape_values")) … } }`).
  *
  * Why an interpreter: a Catalyst expression tree is static, so
  * recursion can only be INLINED, and a body with multiple recursive
  * call sites grows exponentially per inlined level (measured minutes of
  * driver analysis time at depth 4). Recursive maps instead compile to
  * ONE interpreted kernel expression that walks the jackson tree per
  * row — exactly the execution class the reference uses for every
  * mapping. Non-recursive maps keep the fully-codegen'd inline path
  * (Compiler.applyNamedMap); only recursion pays interpreter cost.
  */
object MapInterp {

  private val F = JsonNodeFactory.instance
  private val mapper = new ObjectMapper()

  /** Deletion marker (identity-compared). */
  val Deleted: JsonNode = F.textNode(Values.DeletedSentinel)

  final case class Ctx(maps: Map[String, Seq[Stmt]],
                       envVars: Map[String, String])

  def parse(json: String): JsonNode = mapper.readTree(json)
  def render(n: JsonNode): String = mapper.writeValueAsString(n)

  /** Apply map `name` to `v`. Map bodies: `let` + one whole-root
    * assignment (same restriction as the inline path). */
  def applyMap(name: String, v: JsonNode, ctx: Ctx, depth: Int = 0): JsonNode = {
    // runaway-document guard: surface as an error (recoverable via the
    // pipeline error channel) instead of returning the value unmapped
    if (depth > 256) throw new IllegalStateException(
      s"recursive map '$name': depth > 256")
    val stmts = ctx.maps.getOrElse(name,
      throw new IllegalArgumentException(s"unknown map: $name"))
    var vars = Map.empty[String, JsonNode]
    var result: JsonNode = v
    stmts.foreach {
      case LetAssign(n, e) => vars += (n -> eval(e, v, vars, ctx, depth))
      case RootAssign(Seq(), e) => result = eval(e, v, vars, ctx, depth)
      case other => throw new IllegalArgumentException(
        s"map $name: map bodies support let + whole-root assignment, got $other")
    }
    result
  }

  private def typeName(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isBoolean) "bool"
    else "number"

  private def truthy(n: JsonNode): Boolean =
    n != null && !n.isNull && n.isBoolean && n.asBoolean()

  private def num(n: JsonNode): Double = n.asDouble()

  private def eval(e: Expr, thisV: JsonNode, vars: Map[String, JsonNode],
                   ctx: Ctx, depth: Int): JsonNode = e match {
    case StrLit(s) => F.textNode(s)
    case IntLit(n) => F.numberNode(n)
    case FloatLit(n) => F.numberNode(n)
    case BoolLit(b) => F.booleanNode(b)
    case NullLit => F.nullNode()

    case ThisPath(segs) => navigate(thisV, segs)
    case BarePath(segs) => navigate(thisV, segs)
    case VarRef(n) => vars.getOrElse(n, F.nullNode())

    case ArrLit(items) =>
      val a = F.arrayNode()
      items.foreach { it =>
        val v = eval(it, thisV, vars, ctx, depth)
        if (!(v eq Deleted)) a.add(v)
      }
      a
    case ObjLit(fields) =>
      val o = F.objectNode()
      fields.foreach { case (k, ve) =>
        val v = eval(ve, thisV, vars, ctx, depth)
        if (!(v eq Deleted) && !v.isNull) o.set[JsonNode](k, v)
      }
      o
    case ObjLitDyn(fields) =>
      val o = F.objectNode()
      fields.foreach { case (k, ve) =>
        val key = k match {
          case Left(s) => s
          case Right(e) => strForm(eval(e, thisV, vars, ctx, depth))
        }
        val v = eval(ve, thisV, vars, ctx, depth)
        if (!(v eq Deleted) && !v.isNull) o.set[JsonNode](key, v)
      }
      o

    case FnCall("deleted", _) => Deleted
    case FnCall("env", Seq(StrLit(k))) =>
      ctx.envVars.get(k).map(F.textNode).getOrElse(F.nullNode())
    case FnCall(name, _) => throw new IllegalArgumentException(
      s"recursive-map interpreter: function $name unsupported")

    case UnOp("!", x) => F.booleanNode(!truthy(eval(x, thisV, vars, ctx, depth)))
    case UnOp("-", x) => F.numberNode(-num(eval(x, thisV, vars, ctx, depth)))
    case UnOp(op, _) => throw new IllegalArgumentException(s"unary $op")

    case BinOp(op, le, re) =>
      lazy val l = eval(le, thisV, vars, ctx, depth)
      lazy val r = eval(re, thisV, vars, ctx, depth)
      op match {
        case "==" => F.booleanNode(jsonEq(l, r))
        case "!=" => F.booleanNode(!jsonEq(l, r))
        case "&&" => F.booleanNode(truthy(l) && truthy(r))
        case "||" => F.booleanNode(truthy(l) || truthy(r))
        case "<" => F.booleanNode(cmp(l, r) < 0)
        case "<=" => F.booleanNode(cmp(l, r) <= 0)
        case ">" => F.booleanNode(cmp(l, r) > 0)
        case ">=" => F.booleanNode(cmp(l, r) >= 0)
        case "+" =>
          if (l.isTextual || r.isTextual) F.textNode(l.asText() + r.asText())
          else F.numberNode(num(l) + num(r))
        case "-" => F.numberNode(num(l) - num(r))
        case "*" => F.numberNode(num(l) * num(r))
        case "/" => F.numberNode(num(l) / num(r))
        case "%" => F.numberNode(l.asLong() % r.asLong())
        case other => throw new IllegalArgumentException(s"op $other")
      }

    case Pipe(le, re) =>
      val l = try eval(le, thisV, vars, ctx, depth)
        catch { case _: Exception => F.nullNode() }
      if (l != null && !l.isNull) l else eval(re, thisV, vars, ctx, depth)

    case IfExpr(c, t, els) =>
      if (truthy(eval(c, thisV, vars, ctx, depth)))
        eval(t, thisV, vars, ctx, depth)
      else els.map(eval(_, thisV, vars, ctx, depth)).getOrElse(F.nullNode())

    case MatchExpr(target, cases) =>
      val tv = target.map(eval(_, thisV, vars, ctx, depth)).getOrElse(thisV)
      cases.collectFirst {
        case (Some(c), body) if truthy(eval(c, tv, vars, ctx, depth)) =>
          eval(body, tv, vars, ctx, depth)
        case (None, body) => eval(body, tv, vars, ctx, depth)
      }.getOrElse(F.nullNode())

    case MethodCall(recv, name, args) =>
      method(eval(recv, thisV, vars, ctx, depth), name, args, thisV, vars, ctx, depth)

    case Lambda(_, _) => throw new IllegalArgumentException(
      "lambda outside method argument")
  }

  private def navigate(base: JsonNode, segs: Seq[String]): JsonNode =
    segs.foldLeft(base) { (n, s) =>
      if (n == null) F.nullNode()
      else if (n.isArray && s.forall(_.isDigit)) {
        val i = s.toInt
        if (i < n.size()) n.get(i) else F.nullNode()
      }
      else if (n.isObject && n.has(s)) n.get(s)
      else F.nullNode()
    }

  private def jsonEq(l: JsonNode, r: JsonNode): Boolean =
    if (l.isNumber && r.isNumber) num(l) == num(r) else l == r

  /** Ordering comparison mirroring the compiled path's cmpCol: numeric
    * only when BOTH operands are numbers, else string-form comparison —
    * NOT asDouble coercion (which turns non-numbers into 0.0 and makes
    * the same mapping disagree inside vs outside a recursive map).
    */
  private def cmp(l: JsonNode, r: JsonNode): Int = {
    if (l.isNumber && r.isNumber) java.lang.Double.compare(num(l), num(r))
    else strForm(l).compareTo(strForm(r))
  }

  private def strForm(n: JsonNode): String =
    if (n == null || n.isNull) ""
    else if (n.isTextual) n.asText()
    else render(n)

  private def method(recv: JsonNode, name: String, args: Seq[Expr],
                     thisV: JsonNode, vars: Map[String, JsonNode],
                     ctx: Ctx, depth: Int): JsonNode = {
    // a method argument evaluates per element with `this` rebound
    // (expression-form lambda) or with an explicit parameter
    def lam(elem: JsonNode): JsonNode = args.head match {
      case Lambda(p, body) => eval(body, thisV, vars + (p -> elem), ctx, depth)
      case body => eval(body, elem, vars, ctx, depth)
    }
    name match {
      case "apply" => args match {
        case Seq(StrLit(m)) => applyMap(m, recv, ctx, depth + 1)
        case _ => throw new IllegalArgumentException("apply needs a literal name")
      }
      case "type" => F.textNode(typeName(recv))
      case "map_each" =>
        if (recv.isObject) {
          val o = F.objectNode()
          recv.properties().asScala.foreach { en =>
            val entry = F.objectNode()
            entry.set[JsonNode]("key", F.textNode(en.getKey))
            entry.set[JsonNode]("value", en.getValue)
            val v = lam(entry)
            if (!(v eq Deleted)) o.set[JsonNode](en.getKey, v)
          }
          o
        } else {
          val a = F.arrayNode()
          recv.elements().asScala.foreach { el =>
            val v = lam(el)
            if (!(v eq Deleted)) a.add(v)
          }
          a
        }
      case "filter" =>
        val a = F.arrayNode()
        recv.elements().asScala.foreach(el => if (truthy(lam(el))) a.add(el))
        a
      case "length" => F.numberNode(
        if (recv.isTextual) recv.asText().length.toLong
        else if (recv.isArray || recv.isObject) recv.size().toLong
        else 0L)
      case "string" => F.textNode(
        if (recv.isTextual) recv.asText() else render(recv))
      case "number" => F.numberNode(recv.asDouble())
      case "trim" => F.textNode(recv.asText().trim)
      case "uppercase" => F.textNode(recv.asText().toUpperCase)
      case "lowercase" => F.textNode(recv.asText().toLowerCase)
      case "capitalize" => F.textNode {
        val s = recv.asText()
        if (s.isEmpty) s else s.substring(0, 1).toUpperCase + s.substring(1)
      }
      // Go html.(Un)EscapeString entity tables — keep in sync with the
      // codegen'd Methods escape_html/unescape_html
      case "unescape_html" => F.textNode(
        Seq("&lt;" -> "<", "&gt;" -> ">", "&#39;" -> "'", "&#34;" -> "\"",
          "&quot;" -> "\"", "&amp;" -> "&").foldLeft(recv.asText()) {
          case (s, (from, to)) => s.replace(from, to)
        })
      case "escape_html" => F.textNode(
        Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
          "'" -> "&#39;", "\"" -> "&#34;").foldLeft(recv.asText()) {
          case (s, (from, to)) => s.replace(from, to)
        })
      case "or" =>
        if (recv == null || recv.isNull) lam(thisV) else recv
      case "catch" =>
        recv // evaluation already succeeded
      case other => throw new IllegalArgumentException(
        s"recursive-map interpreter: method $other unsupported " +
          "(extend MapInterp.method as fixtures need)")
    }
  }
}

/** Catalyst expression wrapping [[MapInterp]]: JSON text in → mapped
  * JSON text out (null = the map deleted the value). Interpreted
  * (CodegenFallback) by design — see the MapInterp scaladoc.
  */
case class MapApplyInterp(child: Expression, mapName: String,
                          maps: Map[String, Seq[Ast.Stmt]],
                          envVars: Map[String, String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_map_apply"
  @transient private lazy val ctx = MapInterp.Ctx(maps, envVars)
  override protected def nullSafeEval(a: Any): Any = {
    val node = MapInterp.parse(a.asInstanceOf[UTF8String].toString)
    val out = MapInterp.applyMap(mapName, node, ctx)
    if (out eq MapInterp.Deleted) null
    else UTF8String.fromString(MapInterp.render(out))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
