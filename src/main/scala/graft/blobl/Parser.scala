package graft.blobl

import scala.util.parsing.combinator.RegexParsers

import Ast._

/** Recursive-descent parser for the Bloblang subset (see [[Ast]]).
  *
  * Whitespace- and newline-insensitive within expressions (the reference
  * allows method chains split across lines, e.g.
  * reference: config/test/bloblang/cities.blobl:1-4); statements are
  * delimited by the grammar itself (each starts with an assignment
  * target or `if`/`let`). `#` comments run to end of line.
  */
object Parser extends RegexParsers {

  override val whiteSpace = """(\s|#[^\n]*)+""".r

  private val ident = """[A-Za-z_][A-Za-z0-9_]*""".r

  // ── literals ────────────────────────────────────────────────────────
  // triple-quoted strings are RAW: literal newlines and backslashes, no
  // escape processing, terminated only by `"""` (bloblang/about.adoc:190-225)
  private def tripleStrLit: Parser[StrLit] =
    """\"\"\"(?s:[^"]|"(?!""))*\"\"\"""".r ^^ { raw =>
      StrLit(raw.substring(3, raw.length - 3))
    }

  private def strLit: Parser[StrLit] =
    tripleStrLit |
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { raw =>
      StrLit(unescape(raw.substring(1, raw.length - 1)))
    }

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def numLit: Parser[Expr] =
    """-?\d+\.\d+([eE][+-]?\d+)?""".r ^^ (s => FloatLit(s.toDouble)) |
    """-?\d+[eE][+-]?\d+""".r ^^ (s => FloatLit(s.toDouble)) |
    """-?\d+""".r ^^ (s => IntLit(s.toLong))

  private def boolLit: Parser[Expr] =
    "true\\b".r ^^^ BoolLit(true) | "false\\b".r ^^^ BoolLit(false)

  private def nullLit: Parser[Expr] = "null\\b".r ^^^ NullLit

  private def arrLit: Parser[Expr] =
    "[" ~> repsep(expr, ",") <~ opt(",") <~ "]" ^^ ArrLit.apply

  // a key is a literal (quoted string / bare ident) or a COMPUTED
  // expression (bloblang dynamic keys — `{ $x.index(i): v }`). The
  // literal forms must win first: a bare ident key is a NAME, not a
  // this-relative reference.
  private def objField: Parser[(Either[String, Expr], Expr)] =
    ((strLit ^^ (_.v) | ident) ~ (":" ~> expr) ^^ {
      case k ~ v => (Left(k): Either[String, Expr], v)
    }) |
    (expr ~ (":" ~> expr) ^^ {
      case k ~ v => (Right(k): Either[String, Expr], v)
    })

  private def objLit: Parser[Expr] =
    "{" ~> repsep(objField, ",") <~ opt(",") <~ "}" ^^ { fields =>
      if (fields.forall(_._1.isLeft))
        ObjLit(fields.map { case (k, v) => (k.left.get, v) })
      else ObjLitDyn(fields)
    }

  // ── primary expressions ─────────────────────────────────────────────
  private def lambda: Parser[Expr] =
    (ident <~ "->") ~ expr ^^ { case p ~ b => Lambda(p, b) }

  private def ifExpr: Parser[Expr] =
    ("if\\b".r ~> expr) ~ ("{" ~> expr <~ "}") ~
      opt("else\\b".r ~> (("{" ~> expr <~ "}") | ifExpr)) ^^ {
        case c ~ t ~ e => IfExpr(c, t, e)
      }

  private def matchCase: Parser[(Option[Expr], Expr)] =
    ("_" ~> "=>" ~> expr ^^ (e => (None, e))) |
    (expr ~ ("=>" ~> expr) ^^ { case c ~ e => (Some(c), e) })

  private def matchExpr: Parser[Expr] =
    ("match\\b".r ~> opt(expr)) ~ ("{" ~> repsep(matchCase, opt(",")) <~ opt(",") <~ "}") ^^ {
      case t ~ cs => MatchExpr(t, cs)
    }

  // `this` / idents consume ONLY their own token — all `.ident[(args)]`
  // postfix (field access vs method call, decided by the parens) is
  // handled uniformly by [[postfixed]]
  private def thisPath: Parser[Expr] = "this\\b".r ^^^ ThisPath(Nil)

  private def varRef: Parser[Expr] = "$" ~> ident ^^ VarRef.apply

  private def metaRef: Parser[Expr] = "@" ~> opt(ident) ^^ MetaRef.apply

  // call arguments may be NAMED (`format_json(no_indent: true)` —
  // bloblang named params). Names are accepted in declaration order and
  // stripped to positional values: every named-call site in the
  // reference corpus lists params in signature order, and methods here
  // dispatch positionally.
  private def callArg: Parser[Expr] =
    opt(ident <~ ":" <~ not("=")) ~ expr ^^ { case _ ~ e => e }

  private def fnOrBare: Parser[Expr] =
    ident ~ opt("(" ~> repsep(callArg, ",") <~ ")") ^^ {
      case name ~ Some(args) => FnCall(name, args)
      case name ~ None => BarePath(Seq(name))
    }

  private def parens: Parser[Expr] = "(" ~> expr <~ ")"

  private def primary: Parser[Expr] =
    ifExpr | matchExpr | strLit | numLit | boolLit | nullLit |
      arrLit | objLit | thisPath | varRef | metaRef | parens | fnOrBare

  // method-call / field-access postfix chain; a QUOTED segment
  // (`this."service.name"` — keys containing dots, reference bloblang
  // about.adoc path syntax) is always a field access
  private def pathSeg: Parser[(String, Option[Seq[Expr]])] =
    (strLit ^^ (s => (s.v, None: Option[Seq[Expr]]))) |
      // digit-LEADING but letter-bearing segment = field name
      // (`this.analytics.install.30d.benthos`,
      // config/examples/track_benthos_downloads.yaml)
      ("[0-9]+[A-Za-z_][A-Za-z0-9_]*".r ^^
        (n => (n, None: Option[Seq[Expr]]))) |
      // numeric segment = array index (`this.0`, reference path syntax)
      ("[0-9]+".r ^^ (n => (n, None: Option[Seq[Expr]]))) |
      (ident ~ opt("(" ~> repsep(callArg, ",") <~ ")") ^^ {
        case n ~ a => (n, a.map(_.toSeq))
      })

  private def postfixed: Parser[Expr] =
    primary ~ rep("." ~> pathSeg) ^^ {
      case base ~ chain =>
        chain.foldLeft(base) {
          case (recv, (name, Some(args))) => MethodCall(recv, name, args)
          case (recv, (name, None)) =>
            recv match {
              case ThisPath(segs) => ThisPath(segs :+ name)
              case BarePath(segs) => BarePath(segs :+ name)
              case other => MethodCall(other, "get_field", Seq(StrLit(name)))
            }
        }
    }

  private def unary: Parser[Expr] =
    ("!" ~> unary ^^ (e => UnOp("!", e))) |
    ("-" ~> unary ^^ (e => UnOp("-", e))) |
    postfixed

  private def binaryLevel(ops: Seq[String], next: Parser[Expr]): Parser[Expr] =
    next ~ rep(ops.map(literal).reduce(_ | _) ~ next) ^^ { case h ~ t =>
      t.foldLeft(h) { case (l, op ~ r) => BinOp(op.trim, l, r) }
    }

  private def mulDiv = binaryLevel(Seq("*", "/", "%"), unary)
  private def addSub = binaryLevel(Seq("+", "-"), mulDiv)
  private def cmp = binaryLevel(Seq("<=", ">=", "==", "!=", "<", ">"), addSub)
  private def andE = binaryLevel(Seq("&&"), cmp)
  private def orE = binaryLevel(Seq("||"), andE)

  private def piped: Parser[Expr] =
    orE ~ rep("|" ~> orE) ^^ { case h ~ t => t.foldLeft(h)(Pipe.apply) }

  def expr: Parser[Expr] = lambda | piped

  // ── statements ──────────────────────────────────────────────────────
  private def rootAssign: Parser[Stmt] =
    // segments: idents, quoted keys ("-"/"0" address arrays), and bare
    // numeric indexes (root.items.0.name = …)
    ("root\\b".r ~> rep("." ~> (ident | strLit ^^ (_.v) | "[0-9]+".r))) ~
      ("=" ~> expr) ^^ {
        case segs ~ v => RootAssign(segs, v)
      }

  private def metaAssign: Parser[Stmt] =
    ("meta\\b".r ~> (strLit ^^ (_.v) | ident)) ~ ("=" ~> expr) ^^ {
      case k ~ v => MetaAssign(k, v)
    }

  private def metaWholeAssign: Parser[Stmt] =
    ("meta\\b".r ~> "=" ~> expr) ^^ MetaWholeAssign.apply

  private def letAssign: Parser[Stmt] =
    ("let\\b".r ~> ident) ~ ("=" ~> expr) ^^ { case n ~ v => LetAssign(n, v) }

  private def bareAssign: Parser[Stmt] =
    rep1sep(ident, ".") ~ ("=" ~> expr) ^^ { case segs ~ v => RootAssign(segs, v) }

  private def ifStmt: Parser[Stmt] =
    ("if\\b".r ~> expr) ~ ("{" ~> rep(stmt) <~ "}") ~
      opt("else\\b".r ~> "{" ~> rep(stmt) <~ "}") ^^ {
        case c ~ t ~ e => IfStmt(c, t, e.getOrElse(Nil))
      }

  private def mapDecl: Parser[Stmt] =
    ("map\\b".r ~> (ident | strLit ^^ (_.v))) ~ ("{" ~> rep(stmt) <~ "}") ^^ {
      case n ~ ss => MapDecl(n, ss)
    }

  private def stmt: Parser[Stmt] =
    mapDecl | rootAssign | metaAssign | metaWholeAssign | letAssign | ifStmt | bareAssign

  def mapping: Parser[Mapping] = rep(stmt) ^^ Mapping.apply

  /** Parse a full mapping; throws IllegalArgumentException with position
    * info on syntax errors.
    */
  def parse(src: String): Mapping = parseAll(mapping, src) match {
    case Success(m, _) => m
    case NoSuccess(msg, rest) =>
      throw new IllegalArgumentException(
        s"blobl parse error at ${rest.pos.line}:${rest.pos.column}: $msg")
    case other =>
      throw new IllegalArgumentException(s"blobl parse error: $other")
  }

  /** Parse a standalone expression (for interpolations / conditions). */
  def parseExpr(src: String): Expr = parseAll(expr, src) match {
    case Success(e, _) => e
    case NoSuccess(msg, rest) =>
      throw new IllegalArgumentException(
        s"blobl parse error at ${rest.pos.line}:${rest.pos.column}: $msg")
    case other =>
      throw new IllegalArgumentException(s"blobl parse error: $other")
  }
}
