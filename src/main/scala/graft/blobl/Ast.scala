package graft.blobl

/** AST for the Bloblang-subset mapping language.
  *
  * Grammar surface follows the reference language guide
  * (reference: docs/modules/guides/pages/bloblang/about.adoc:19-253):
  * newline-separated assignment statements over `root`/`this`/`meta`,
  * expression-level `if`, method chains, single-param lambdas, `let`
  * variables, and the error-coalescing pipe / `catch`.
  */
object Ast {

  sealed trait Expr

  case class StrLit(v: String) extends Expr
  case class IntLit(v: Long) extends Expr
  case class FloatLit(v: Double) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case class ArrLit(items: Seq[Expr]) extends Expr
  case class ObjLit(fields: Seq[(String, Expr)]) extends Expr
  /** Object literal with at least one COMPUTED key (bloblang dynamic
    * keys, e.g. `{ $results.index(i): v }` — config/rag/eval.yaml).
    */
  case class ObjLitDyn(fields: Seq[(Either[String, Expr], Expr)]) extends Expr

  /** `this` or `this.a.b`; empty segs = whole document. */
  case class ThisPath(segs: Seq[String]) extends Expr
  /** Bare identifier path (`foo.bar`): context-relative — resolves to the
    * nearest enclosing lambda parameter of that name, else `this.<path>`.
    */
  case class BarePath(segs: Seq[String]) extends Expr
  /** `$name` — a `let` variable reference. */
  case class VarRef(name: String) extends Expr
  /** `@key` / `metadata("key")` read. */
  case class MetaRef(key: Option[String]) extends Expr

  case class FnCall(name: String, args: Seq[Expr]) extends Expr
  case class MethodCall(recv: Expr, name: String, args: Seq[Expr]) extends Expr
  case class Lambda(param: String, body: Expr) extends Expr

  case class UnOp(op: String, e: Expr) extends Expr
  case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  /** `l | r` — evaluate l; on error/absence use r (about.adoc:98-110). */
  case class Pipe(l: Expr, r: Expr) extends Expr
  case class IfExpr(cond: Expr, thn: Expr, els: Option[Expr]) extends Expr
  /** `match { cond => expr, _ => expr }` (optionally with a target whose
    * value becomes the context for the case conditions).
    */
  case class MatchExpr(target: Option[Expr],
                       cases: Seq[(Option[Expr], Expr)]) extends Expr

  sealed trait Stmt
  /** `root = expr` / `root.a.b = expr` (segs empty = whole root). */
  case class RootAssign(segs: Seq[String], value: Expr) extends Stmt
  /** Bare `foo.bar = expr` — shorthand for root.foo.bar. */
  case class MetaAssign(key: String, value: Expr) extends Stmt
  /** `meta = expr` — replace the WHOLE metadata map (bloblang
    * about.adoc metadata assignment; config/rag/ingestion strips key
    * prefixes this way). */
  case class MetaWholeAssign(value: Expr) extends Stmt
  case class LetAssign(name: String, value: Expr) extends Stmt
  /** Statement-level `if cond { stmts } else { stmts }`. */
  case class IfStmt(cond: Expr, thn: Seq[Stmt], els: Seq[Stmt]) extends Stmt
  /** `map name { stmts }` — a named reusable mapping, applied with
    * `.apply("name")` (reference bloblang/about.adoc:332-353). */
  case class MapDecl(name: String, stmts: Seq[Stmt]) extends Stmt

  case class Mapping(stmts: Seq[Stmt])
}
