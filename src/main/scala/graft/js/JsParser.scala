package graft.js

import scala.collection.mutable.ArrayBuffer

import JsAst._
import JsLexer._

/** Recursive-descent parser for the ES5-subset (+ the ES6 conveniences
  * the reference's test corpus uses: arrow functions, let/const,
  * template literals, for-of, rest params).
  *
  * ASI: a statement may end at `;`, `}`, EOF, or a token preceded by a
  * newline that cannot continue the current expression — the same
  * restricted-production rule real engines apply to `return`/`break`/
  * `continue` is honored for those keywords.
  */
object JsParser {

  class ParseError(msg: String) extends RuntimeException(msg)

  def parse(src: String): Program = new P(JsLexer.lex(src)).parseProgram()

  /** Parse a single expression (template-literal interpolations). */
  def parseExpr(src: String): Expr = {
    val p = new P(JsLexer.lex(src))
    val e = p.expression()
    p.expectEOF()
    e
  }

  private final class P(toks: IndexedSeq[Tok]) {
    private var pos = 0

    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }

    private def isPunct(s: String): Boolean = peek match {
      case TPunct(p, _) => p == s
      case _ => false
    }
    private def isKeyword(s: String): Boolean = peek match {
      case TKeyword(k, _) => k == s
      case _ => false
    }
    private def eat(s: String): Boolean =
      if (isPunct(s)) { pos += 1; true } else false
    private def expect(s: String): Unit =
      if (!eat(s)) throw new ParseError(s"expected '$s', got $describe")
    private def eatKeyword(s: String): Boolean =
      if (isKeyword(s)) { pos += 1; true } else false
    private def describe: String = peek match {
      case TPunct(p, _) => s"'$p'"
      case TKeyword(k, _) => s"keyword $k"
      case TIdent(n, _) => s"identifier $n"
      case TNum(v, _) => s"number $v"
      case TStr(_, _) => "string"
      case TTemplate(_, _, _) => "template"
      case TRegex(_, _, _) => "regex"
      case TEOF(_) => "end of input"
    }

    def expectEOF(): Unit = peek match {
      case TEOF(_) => ()
      case _ => throw new ParseError(s"unexpected $describe")
    }

    def parseProgram(): Program = {
      val stmts = ArrayBuffer.empty[Stmt]
      while (!peek.isInstanceOf[TEOF]) stmts += statement()
      Program(stmts.toSeq)
    }

    /** Consume a statement terminator per ASI. */
    private def semicolon(): Unit = {
      if (eat(";")) ()
      else peek match {
        case TEOF(_) => ()
        case TPunct("}", _) => ()
        case t if t.nl => ()
        case _ => throw new ParseError(s"expected ';' before $describe")
      }
    }

    private def statement(): Stmt = peek match {
      case TPunct(";", _) => next(); EmptyStmt
      case TPunct("{", _) => Block(block())
      case TKeyword("var", _) | TKeyword("let", _) | TKeyword("const", _) =>
        val kind = next().asInstanceOf[TKeyword].name
        val d = varDecls(kind)
        semicolon(); d
      case TKeyword("function", _) =>
        next()
        val name = identName()
        val (params, body) = funcRest()
        FuncDecl(name, params, body)
      case TKeyword("if", _) =>
        next(); expect("(")
        val test = expression()
        expect(")")
        val cons = statement()
        val alt = if (eatKeyword("else")) Some(statement()) else None
        If(test, cons, alt)
      case TKeyword("for", _) => forStatement()
      case TKeyword("while", _) =>
        next(); expect("(")
        val test = expression()
        expect(")")
        While(test, statement())
      case TKeyword("do", _) =>
        next()
        val body = statement()
        if (!eatKeyword("while")) throw new ParseError("expected 'while' after do body")
        expect("(")
        val test = expression()
        expect(")")
        semicolon()
        DoWhile(body, test)
      case TKeyword("switch", _) =>
        next(); expect("(")
        val disc = expression()
        expect(")"); expect("{")
        val cases = ArrayBuffer.empty[SwitchCase]
        while (!eat("}")) {
          val test =
            if (eatKeyword("case")) { val e = expression(); expect(":"); Some(e) }
            else if (eatKeyword("default")) { expect(":"); None }
            else throw new ParseError(s"expected case/default, got $describe")
          val body = ArrayBuffer.empty[Stmt]
          while (!isPunct("}") && !isKeyword("case") && !isKeyword("default"))
            body += statement()
          cases += SwitchCase(test, body.toSeq)
        }
        Switch(disc, cases.toSeq)
      case TKeyword("break", _) => next(); semicolon(); BreakStmt
      case TKeyword("continue", _) => next(); semicolon(); ContinueStmt
      case TKeyword("return", _) =>
        next()
        val v = peek match {
          case TPunct(";", _) | TPunct("}", _) | TEOF(_) => None
          case t if t.nl => None // restricted production
          case _ => Some(expression())
        }
        semicolon()
        Return(v)
      case TKeyword("throw", _) =>
        next()
        val v = expression()
        semicolon()
        Throw(v)
      case TKeyword("try", _) =>
        next()
        val b = block()
        var catchParam: Option[String] = None
        var catchBlock: Option[Seq[Stmt]] = None
        if (eatKeyword("catch")) {
          if (eat("(")) { catchParam = Some(identName()); expect(")") }
          catchBlock = Some(block())
        }
        val fin = if (eatKeyword("finally")) Some(block()) else None
        if (catchBlock.isEmpty && fin.isEmpty)
          throw new ParseError("try without catch or finally")
        Try(b, catchParam, catchBlock, fin)
      case _ =>
        val e = expression()
        semicolon()
        ExprStmt(e)
    }

    private def block(): Seq[Stmt] = {
      expect("{")
      val stmts = ArrayBuffer.empty[Stmt]
      while (!eat("}")) stmts += statement()
      stmts.toSeq
    }

    private def varDecls(kind: String): Stmt = {
      val decls = ArrayBuffer.empty[(String, Option[Expr])]
      var more = true
      while (more) {
        val name = identName()
        val init = if (eat("=")) Some(assignExpr()) else None
        decls += ((name, init))
        more = eat(",")
      }
      VarDecl(kind, decls.toSeq)
    }

    private def forStatement(): Stmt = {
      next() // for
      expect("(")
      // for-in / for-of with a single declared or bare name
      val save = pos
      val declKind: Option[String] = peek match {
        case TKeyword(k @ ("var" | "let" | "const"), _) => next(); Some(k)
        case _ => None
      }
      peek match {
        case TIdent(name, _) =>
          next()
          if (eatKeyword("in")) {
            val obj = expression()
            expect(")")
            return ForIn(declKind, name, obj, statement(), of = false)
          } else if (eatKeyword("of")) {
            val obj = assignExpr()
            expect(")")
            return ForIn(declKind, name, obj, statement(), of = true)
          }
          pos = save
        case _ => pos = save
      }
      // classic for
      val init: Option[Stmt] =
        if (isPunct(";")) None
        else peek match {
          case TKeyword(k @ ("var" | "let" | "const"), _) =>
            next(); Some(varDecls(k))
          case _ => Some(ExprStmt(expression()))
        }
      expect(";")
      val test = if (isPunct(";")) None else Some(expression())
      expect(";")
      val update = if (isPunct(")")) None else Some(expression())
      expect(")")
      For(init, test, update, statement())
    }

    private def identName(): String = next() match {
      case TIdent(n, _) => n
      case TKeyword("of", _) => "of" // contextual
      case _ => throw new ParseError(s"expected identifier, got $describe")
    }

    private def funcRest(): (Seq[Param], Seq[Stmt]) = {
      expect("(")
      val params = paramList()
      val body = block()
      (params, body)
    }

    private def paramList(): Seq[Param] = {
      val params = ArrayBuffer.empty[Param]
      if (!eat(")")) {
        var more = true
        while (more) {
          val rest = eat("...")
          val name = identName()
          val default = if (!rest && eat("=")) Some(assignExpr()) else None
          params += Param(name, rest, default)
          more = eat(",")
        }
        expect(")")
      }
      params.toSeq
    }

    // ---- expressions ----

    def expression(): Expr = {
      var e = assignExpr()
      while (eat(",")) e = Seq2(e, assignExpr())
      e
    }

    private def assignExpr(): Expr = {
      // arrow functions: ident => …  |  ( params ) => …
      peek match {
        case TIdent(name, _) if laIsArrowAfterIdent =>
          next(); next() // ident, =>
          return arrowBody(Seq(Param(name, rest = false, None)))
        case TPunct("(", _) if laIsArrowAfterParens =>
          next() // (
          val params = paramList()
          expect("=>")
          return arrowBody(params)
        case _ => ()
      }
      val left = condExpr()
      peek match {
        case TPunct(op @ ("=" | "+=" | "-=" | "*=" | "/=" | "%=" | "&=" |
                          "|=" | "^=" | "<<=" | ">>=" | ">>>=" | "**="), _) =>
          left match {
            case _: Ident | _: Member | _: Index =>
              next()
              Assign(op, left, assignExpr())
            case _ => throw new ParseError("invalid assignment target")
          }
        case _ => left
      }
    }

    private def laIsArrowAfterIdent: Boolean = toks.lift(pos + 1) match {
      case Some(TPunct("=>", _)) => true
      case _ => false
    }

    /** From a '(' at pos, scan to its matching ')' and check '=>'. */
    private def laIsArrowAfterParens: Boolean = {
      var depth = 0
      var i = pos
      while (i < toks.length) {
        toks(i) match {
          case TPunct("(", _) => depth += 1
          case TPunct(")", _) =>
            depth -= 1
            if (depth == 0)
              return toks.lift(i + 1) match {
                case Some(TPunct("=>", _)) => true
                case _ => false
              }
          case TEOF(_) => return false
          case _ => ()
        }
        i += 1
      }
      false
    }

    private def arrowBody(params: Seq[Param]): Expr =
      if (isPunct("{"))
        FuncExpr(None, params, block(), arrow = true, exprBody = None)
      else
        FuncExpr(None, params, Nil, arrow = true, exprBody = Some(assignExpr()))

    private def condExpr(): Expr = {
      val test = binaryExpr(0)
      if (eat("?")) {
        val cons = assignExpr()
        expect(":")
        Cond(test, cons, assignExpr())
      } else test
    }

    private def precOf(op: String): Int = op match {
      case "??" => 1
      case "||" => 2
      case "&&" => 3
      case "|" => 4
      case "^" => 5
      case "&" => 6
      case "==" | "!=" | "===" | "!==" => 7
      case "<" | ">" | "<=" | ">=" | "instanceof" | "in" => 8
      case "<<" | ">>" | ">>>" => 9
      case "+" | "-" => 10
      case "*" | "/" | "%" => 11
      case "**" => 12
      case _ => -1
    }

    private def binaryExpr(minPrec: Int): Expr = {
      var left = unaryExpr()
      var done = false
      while (!done) {
        val op = peek match {
          case TPunct(p, _) if precOf(p) >= 0 => p
          case TKeyword("instanceof", _) => "instanceof"
          case TKeyword("in", _) => "in"
          case _ => ""
        }
        val prec = precOf(op)
        if (op.isEmpty || prec < minPrec) done = true
        else {
          next()
          val right =
            if (op == "**") binaryExpr(prec) // right-assoc
            else binaryExpr(prec + 1)
          left =
            if (op == "&&" || op == "||" || op == "??") Logical(op, left, right)
            else Binary(op, left, right)
        }
      }
      left
    }

    private def unaryExpr(): Expr = peek match {
      case TPunct(op @ ("!" | "~" | "+" | "-"), _) =>
        next(); Unary(op, unaryExpr())
      case TPunct(op @ ("++" | "--"), _) =>
        next(); Update(op, unaryExpr(), prefix = true)
      case TKeyword(op @ ("typeof" | "delete" | "void"), _) =>
        next(); Unary(op, unaryExpr())
      case TKeyword("new", _) =>
        next()
        val callee = memberChain(primary(), allowCall = false)
        val args =
          if (eat("(")) {
            val as = ArrayBuffer.empty[Expr]
            if (!eat(")")) {
              var more = true
              while (more) { as += assignExpr(); more = eat(",") }
              expect(")")
            }
            as.toSeq
          } else Nil
        memberChain(postfix(NewExpr(callee, args)), allowCall = true)
      case _ =>
        postfix(memberChain(primary(), allowCall = true))
    }

    private def postfix(e: Expr): Expr = peek match {
      case TPunct(op @ ("++" | "--"), nl) if !nl =>
        next(); Update(op, e, prefix = false)
      case _ => e
    }

    private def memberChain(start: Expr, allowCall: Boolean): Expr = {
      var e = start
      var done = false
      while (!done) {
        if (eat(".")) {
          val name = next() match {
            case TIdent(n, _) => n
            case TKeyword(k, _) => k // obj.delete etc.
            case _ => throw new ParseError("expected property name after '.'")
          }
          e = Member(e, name)
        } else if (eat("?.")) {
          val name = next() match {
            case TIdent(n, _) => n
            case TKeyword(k, _) => k
            case _ => throw new ParseError("expected property name after '?.'")
          }
          // a?.b → (a == null ? undefined : a.b); evaluate a twice is
          // unsound for effects, so desugar via conditional on member
          e = Cond(Binary("==", e, NullLit), UndefinedLit, Member(e, name))
        } else if (eat("[")) {
          val idx = expression()
          expect("]")
          e = Index(e, idx)
        } else if (allowCall && isPunct("(")) {
          next()
          val args = ArrayBuffer.empty[Expr]
          if (!eat(")")) {
            var more = true
            while (more) {
              if (eat("...")) args += Unary("...", assignExpr())
              else args += assignExpr()
              more = eat(",")
            }
            expect(")")
          }
          e = Call(e, args.toSeq)
        } else done = true
      }
      e
    }

    private def primary(): Expr = next() match {
      case TNum(v, _) => NumLit(v)
      case TStr(s, _) => StrLit(s)
      case TTemplate(parts, exprSrcs, _) =>
        TemplateLit(parts, exprSrcs.map(JsParser.parseExpr))
      case TRegex(src, flags, _) => RegexLit(src, flags)
      case TKeyword("true", _) => BoolLit(true)
      case TKeyword("false", _) => BoolLit(false)
      case TKeyword("null", _) => NullLit
      case TKeyword("undefined", _) => UndefinedLit
      case TKeyword("this", _) => ThisExpr
      case TKeyword("function", _) =>
        val name = peek match {
          case TIdent(n, _) => next(); Some(n)
          case _ => None
        }
        val (params, body) = funcRest()
        FuncExpr(name, params, body, arrow = false, exprBody = None)
      case TIdent(n, _) => Ident(n)
      case TKeyword("of", _) => Ident("of")
      case TPunct("(", _) =>
        val e = expression()
        expect(")")
        e
      case TPunct("[", _) =>
        val elems = ArrayBuffer.empty[Expr]
        if (!eat("]")) {
          var more = true
          while (more) {
            if (eat("...")) elems += Unary("...", assignExpr())
            else elems += assignExpr()
            more = eat(",")
            if (more && isPunct("]")) more = false // trailing comma
          }
          expect("]")
        }
        ArrayLit(elems.toSeq)
      case TPunct("{", _) =>
        val props = ArrayBuffer.empty[Prop]
        if (!eat("}")) {
          var more = true
          while (more) {
            val p = peek match {
              case TPunct("[", _) =>
                next()
                val keyE = assignExpr()
                expect("]"); expect(":")
                Prop("", Some(keyE), assignExpr())
              case TPunct("...", _) =>
                next()
                Prop("...", None, assignExpr())
              case _ =>
                val key = next() match {
                  case TIdent(n, _) => n
                  case TKeyword(k, _) => k
                  case TStr(s, _) => s
                  case TNum(v, _) => JsRuntime.numToString(v)
                  case _ => throw new ParseError("bad object key")
                }
                if (eat(":")) Prop(key, None, assignExpr())
                else if (isPunct("(")) { // method shorthand
                  val (params, body) = funcRest()
                  Prop(key, None,
                    FuncExpr(Some(key), params, body, arrow = false, None))
                } else Prop(key, None, Ident(key)) // shorthand
            }
            props += p
            more = eat(",")
            if (more && isPunct("}")) more = false
          }
          expect("}")
        }
        ObjectLit(props.toSeq)
      case t =>
        throw new ParseError(
          s"unexpected token at expression position: ${describeAt(t)}")
    }

    private def describeAt(t: Tok): String = t match {
      case TPunct(p, _) => s"'$p'"
      case TKeyword(k, _) => k
      case TEOF(_) => "end of input"
      case other => other.toString.take(40)
    }
  }
}
