package graft.js

/** AST for the ES5-subset engine behind the `javascript` processor
  * (reference: internal/impl/javascript/processor.go:56 — an embedded
  * ECMAScript 5.1 engine run per message; contract only, no code
  * ported — the reference embeds the goja library, this is an
  * original Scala front-end + tree-walking evaluator).
  *
  * All nodes are serializable case classes so a compiled program can
  * ride a Spark closure to executors.
  */
object JsAst {

  sealed trait Node extends Serializable

  // ---- expressions ----
  sealed trait Expr extends Node
  case class NumLit(v: Double) extends Expr
  case class StrLit(v: String) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case object UndefinedLit extends Expr
  case class RegexLit(source: String, flags: String) extends Expr
  case class TemplateLit(parts: Seq[String], exprs: Seq[Expr]) extends Expr
  case class Ident(name: String) extends Expr
  case object ThisExpr extends Expr
  case class ArrayLit(elems: Seq[Expr]) extends Expr
  /** key is the literal property name; computed=true means key expr. */
  case class Prop(key: String, keyExpr: Option[Expr], value: Expr)
  case class ObjectLit(props: Seq[Prop]) extends Expr
  case class FuncExpr(name: Option[String], params: Seq[Param],
                      body: Seq[Stmt], arrow: Boolean,
                      exprBody: Option[Expr]) extends Expr
  case class Param(name: String, rest: Boolean, default: Option[Expr])
  case class Unary(op: String, operand: Expr) extends Expr
  case class Update(op: String, operand: Expr, prefix: Boolean) extends Expr
  case class Binary(op: String, l: Expr, r: Expr) extends Expr
  case class Logical(op: String, l: Expr, r: Expr) extends Expr
  case class Cond(test: Expr, cons: Expr, alt: Expr) extends Expr
  case class Assign(op: String, target: Expr, value: Expr) extends Expr
  case class Member(obj: Expr, prop: String) extends Expr
  case class Index(obj: Expr, index: Expr) extends Expr
  case class Call(callee: Expr, args: Seq[Expr]) extends Expr
  case class NewExpr(callee: Expr, args: Seq[Expr]) extends Expr
  case class Seq2(l: Expr, r: Expr) extends Expr // comma operator

  // ---- statements ----
  sealed trait Stmt extends Node
  case class VarDecl(kind: String, decls: Seq[(String, Option[Expr])]) extends Stmt
  case class ExprStmt(e: Expr) extends Stmt
  case class FuncDecl(name: String, params: Seq[Param], body: Seq[Stmt]) extends Stmt
  case class If(test: Expr, cons: Stmt, alt: Option[Stmt]) extends Stmt
  case class Block(stmts: Seq[Stmt]) extends Stmt
  case class For(init: Option[Stmt], test: Option[Expr],
                 update: Option[Expr], body: Stmt) extends Stmt
  case class ForIn(decl: Option[String], name: String, obj: Expr,
                   body: Stmt, of: Boolean) extends Stmt
  case class While(test: Expr, body: Stmt) extends Stmt
  case class DoWhile(body: Stmt, test: Expr) extends Stmt
  case class SwitchCase(test: Option[Expr], body: Seq[Stmt])
  case class Switch(disc: Expr, cases: Seq[SwitchCase]) extends Stmt
  case object BreakStmt extends Stmt
  case object ContinueStmt extends Stmt
  case class Return(value: Option[Expr]) extends Stmt
  case class Throw(value: Expr) extends Stmt
  case class Try(block: Seq[Stmt], catchParam: Option[String],
                 catchBlock: Option[Seq[Stmt]],
                 finallyBlock: Option[Seq[Stmt]]) extends Stmt
  case object EmptyStmt extends Stmt

  case class Program(stmts: Seq[Stmt]) extends Node
}
