package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.js.{JsInterp, JsRuntime}
import graft.js.JsRuntime._

/** Language conformance for the ES5-subset engine behind the
  * `javascript` processor. Expected values mirror real-engine
  * behavior (goja / V8) for each snippet.
  */
class JsInterpSpec extends AnyFunSuite {

  private def run(src: String): Any = new JsInterp().runSource(src)
  private def ex(src: String): Any = JsRuntime.export(run(src))

  test("arithmetic, precedence, coercion") {
    assert(ex("1 + 2 * 3") == 7L)
    assert(ex("(1 + 2) * 3") == 9L)
    assert(ex("7 % 3") == 1L)
    assert(ex("2 ** 10") == 1024L)
    assert(ex("10 / 4") == 2.5)
    assert(ex("'a' + 1") == "a1")
    assert(ex("1 + '2'") == "12")
    assert(ex("'3' * '4'") == 12L)
    assert(ex("'5' - 2") == 3L)
    assert(ex("+'42'") == 42L)
    assert(ex("-(-5)") == 5L)
    assert(ex("1/0") == Double.PositiveInfinity)
    assert(run("0/0").asInstanceOf[Double].isNaN)
  }

  test("comparison and equality") {
    assert(ex("1 < 2") == true)
    assert(ex("'a' < 'b'") == true)
    assert(ex("'10' == 10") == true)
    assert(ex("'10' === 10") == false)
    assert(ex("null == undefined") == true)
    assert(ex("null === undefined") == false)
    assert(ex("NaN == NaN") == false)
    assert(ex("true == 1") == true)
    assert(ex("'' == 0") == true)
  }

  test("logical and ternary") {
    assert(ex("true && 'yes'") == "yes")
    assert(ex("false || 'fallback'") == "fallback")
    assert(ex("null ?? 'dflt'") == "dflt")
    assert(ex("0 ?? 'dflt'") == 0L)
    assert(ex("1 < 2 ? 'a' : 'b'") == "a")
  }

  test("variables, scoping, closures") {
    assert(ex("var x = 1; x += 2; x") == 3L)
    assert(ex("let a = 1; { let a = 2; } a") == 1L)
    assert(ex(
      """function counter() { let n = 0; return function() { n++; return n; }; }
        |let c = counter(); c(); c(); c()""".stripMargin) == 3L)
  }

  test("functions: decl, expr, arrow, defaults, rest, hoisting") {
    assert(ex("function add(a, b) { return a + b; } add(2, 3)") == 5L)
    assert(ex("let f = function(a) { return a * 2; }; f(21)") == 42L)
    assert(ex("let f = a => a + 1; f(1)") == 2L)
    assert(ex("let f = (a, b) => a * b; f(6, 7)") == 42L)
    assert(ex("let f = (a, b = 10) => a + b; f(5)") == 15L)
    assert(ex("function f(...xs) { return xs.length; } f(1,2,3)") == 3L)
    assert(ex("g(); function g() { return 1; } g()") == 1L)
    assert(ex("(() => { return 7; })()") == 7L)
  }

  test("this binding: methods and arrows") {
    assert(ex(
      """let obj = { n: 41, get: function() { return this.n + 1; } };
        |obj.get()""".stripMargin) == 42L)
    assert(ex(
      """let obj = { n: 2, f: function() { let g = () => this.n * 10; return g(); } };
        |obj.f()""".stripMargin) == 20L)
  }

  test("control flow: if/for/while/do/switch/break/continue") {
    assert(ex("let s = 0; for (let i = 0; i < 5; i++) s += i; s") == 10L)
    assert(ex("let s = 0; let i = 0; while (i < 4) { s += i; i++; } s") == 6L)
    assert(ex("let n = 0; do { n++; } while (n < 3); n") == 3L)
    assert(ex(
      "let s = 0; for (let i = 0; i < 10; i++) { if (i % 2) continue; if (i > 6) break; s += i; } s"
    ) == 12L)
    assert(ex(
      """let r = '';
        |switch (2) { case 1: r = 'one'; break; case 2: r = 'two'; break; default: r = 'other'; }
        |r""".stripMargin) == "two")
    assert(ex(
      """let r = '';
        |switch (9) { case 1: r = 'one'; break; default: r = 'other'; }
        |r""".stripMargin) == "other")
    // switch fallthrough
    assert(ex(
      """let r = [];
        |switch (1) { case 1: r.push('a'); case 2: r.push('b'); break; case 3: r.push('c'); }
        |r.join('')""".stripMargin) == "ab")
  }

  test("for-in and for-of") {
    assert(ex(
      "let o = {a:1, b:2, c:3}; let ks = []; for (let k in o) ks.push(k); ks.join(',')"
    ) == "a,b,c")
    assert(ex(
      "let s = 0; for (let v of [1,2,3,4]) s += v; s") == 10L)
    assert(ex(
      "let out = ''; for (let ch of 'abc') out += ch + '.'; out") == "a.b.c.")
  }

  test("objects: literals, access, delete, in, spread, computed keys") {
    assert(ex("let o = {a: 1, 'b c': 2}; o.a + o['b c']") == 3L)
    assert(ex("let o = {a: 1}; o.b = 2; o.a + o.b") == 3L)
    assert(ex("let o = {a: 1, b: 2}; delete o.a; Object.keys(o).join(',')") == "b")
    assert(ex("let o = {a: 1}; 'a' in o") == true)
    assert(ex("let o = {a: 1}; 'z' in o") == false)
    assert(ex("let k = 'dyn'; let o = {[k + '1']: 5}; o.dyn1") == 5L)
    assert(ex("let a = {x: 1}; let b = {...a, y: 2}; b.x + b.y") == 3L)
    assert(ex("let x = 3; let o = {x}; o.x") == 3L)
    assert(ex("let o = {f(n) { return n * 2; }}; o.f(21)") == 42L)
    assert(ex("let o = {a: 1}; o.hasOwnProperty('a')") == true)
  }

  test("Object statics") {
    assert(ex("Object.keys({a:1,b:2}).length") == 2L)
    assert(ex("Object.values({a:1,b:2}).join(',')") == "1,2")
    assert(ex("Object.entries({a:1})[0].join(':')") == "a:1")
    assert(ex("let t = {}; Object.assign(t, {a:1}, {b:2}); t.a + t.b") == 3L)
    assert(ex("Object.fromEntries([['k', 7]]).k") == 7L)
  }

  test("arrays: mutation, search, iteration methods") {
    assert(ex("[1,2,3].length") == 3L)
    assert(ex("let a = [1]; a.push(2, 3); a.join('-')") == "1-2-3")
    assert(ex("let a = [1,2,3]; a.pop(); a.length") == 2L)
    assert(ex("let a = [1,2,3]; a.shift(); a[0]") == 2L)
    assert(ex("let a = [2,3]; a.unshift(1); a.join(',')") == "1,2,3")
    assert(ex("[1,2,3,4].slice(1, 3).join(',')") == "2,3")
    assert(ex("[1,2,3,4].slice(-2).join(',')") == "3,4")
    assert(ex("let a = [1,2,3,4]; a.splice(1, 2); a.join(',')") == "1,4")
    assert(ex("let a = [1,4]; a.splice(1, 0, 2, 3); a.join(',')") == "1,2,3,4")
    assert(ex("[1,2].concat([3], 4).join(',')") == "1,2,3,4")
    assert(ex("[1,2,3].indexOf(2)") == 1L)
    assert(ex("[1,2,3].includes(3)") == true)
    assert(ex("[1,2,3].map(x => x * 2).join(',')") == "2,4,6")
    assert(ex("[1,2,3,4].filter(x => x % 2 === 0).join(',')") == "2,4")
    assert(ex("[1,2,3,4].reduce((a, b) => a + b, 0)") == 10L)
    assert(ex("[1,2,3].reduce((a, b) => a + b)") == 6L)
    assert(ex("[5,3,1].find(x => x < 4)") == 3L)
    assert(ex("[5,3,1].findIndex(x => x < 4)") == 1L)
    assert(ex("[1,2,3].some(x => x > 2)") == true)
    assert(ex("[1,2,3].every(x => x > 0)") == true)
    assert(ex("let s = 0; [1,2,3].forEach(x => { s += x; }); s") == 6L)
    assert(ex("[3,1,2].sort().join(',')") == "1,2,3")
    assert(ex("[10, 9, 100].sort().join(',')") == "10,100,9") // string sort
    assert(ex("[10, 9, 100].sort((a,b) => a - b).join(',')") == "9,10,100")
    assert(ex("[1,2,3].reverse().join(',')") == "3,2,1")
    assert(ex("[[1,2],[3]].flat().join(',')") == "1,2,3")
    assert(ex("[1,2].flatMap(x => [x, x * 10]).join(',')") == "1,10,2,20")
    assert(ex("Array.isArray([])") == true)
    assert(ex("Array.isArray('no')") == false)
    assert(ex("Array.from('abc').join('-')") == "a-b-c")
    assert(ex("let a = [1,2,3]; a.length = 1; a.join(',')") == "1")
  }

  test("strings: the full method surface") {
    assert(ex("'hello'.length") == 5L)
    assert(ex("'hello'.toUpperCase()") == "HELLO")
    assert(ex("'HeLLo'.toLowerCase()") == "hello")
    assert(ex("'  pad  '.trim()") == "pad")
    assert(ex("'hello'.charAt(1)") == "e")
    assert(ex("'hello'[1]") == "e")
    assert(ex("'abc'.charCodeAt(0)") == 97L)
    assert(ex("'hello'.indexOf('ll')") == 2L)
    assert(ex("'hello'.includes('ell')") == true)
    assert(ex("'hello'.startsWith('he')") == true)
    assert(ex("'hello'.endsWith('lo')") == true)
    assert(ex("'hello'.slice(1, 3)") == "el")
    assert(ex("'hello'.slice(-3)") == "llo")
    assert(ex("'hello'.substring(3, 1)") == "el") // swapped args
    assert(ex("'a,b,,c'.split(',').length") == 4L)
    assert(ex("'a b  c'.split(/\\s+/).join('|')") == "a|b|c")
    assert(ex("'abc'.split('').join('-')") == "a-b-c")
    assert(ex("'ab'.repeat(3)") == "ababab")
    assert(ex("'5'.padStart(3, '0')") == "005")
    assert(ex("'5'.padEnd(3, 'x')") == "5xx")
    assert(ex("'a-b-c'.replace('-', '_')") == "a_b-c")
    assert(ex("'a-b-c'.replaceAll('-', '_')") == "a_b_c")
    assert(ex("'a-b-c'.replace(/-/g, '_')") == "a_b_c")
    assert(ex("'x12y'.replace(/(\\d+)/, '[$1]')") == "x[12]y")
    assert(ex("'aaa'.replace(/a/g, m => m.toUpperCase())") == "AAA")
    assert(ex("'hello world'.match(/o (w\\w+)/)[1]") == "world")
    assert(ex("'a1b2c3'.match(/\\d/g).join('')") == "123")
    assert(ex("'no digits here!'.match(/\\d/)") == null)
  }

  test("regex literals and RegExp") {
    assert(ex("/ab+c/.test('xabbbcx')") == true)
    assert(ex("/^ab$/.test('xabx')") == false)
    assert(ex("/(\\w+)@(\\w+)/.exec('joe@corp')[2]") == "corp")
    assert(ex("new RegExp('a.c').test('abc')") == true)
    assert(ex("/CASE/i.test('case')") == true)
  }

  test("numbers: formatting and parsing") {
    assert(ex("(255).toString(16)") == "ff")
    assert(ex("(3.14159).toFixed(2)") == "3.14")
    assert(ex("(42).toString()") == "42")
    assert(ex("parseInt('42abc')") == 42L)
    assert(ex("parseInt('ff', 16)") == 255L)
    assert(ex("parseInt('0x1f')") == 31L)
    assert(ex("parseFloat('3.5rest')") == 3.5)
    assert(run("parseInt('nope')").asInstanceOf[Double].isNaN)
    assert(ex("isNaN('x')") == true)
    assert(ex("Number('42') + 1") == 43L)
    assert(ex("Number.isInteger(5)") == true)
    assert(ex("Number.isInteger(5.5)") == false)
    assert(ex("Math.floor(4.9) + Math.ceil(4.1) + Math.round(4.5)") == 14L)
    assert(ex("Math.max(1, 9, 4)") == 9L)
    assert(ex("Math.min(3, -2)") == -2L)
    assert(ex("Math.abs(-7)") == 7L)
    assert(ex("Math.pow(2, 8)") == 256L)
    assert(ex("Math.sqrt(81)") == 9L)
    assert(ex("Math.trunc(-4.7)") == -4L)
  }

  test("JSON round-trips") {
    assert(ex("""JSON.parse('{"a": 1, "b": [true, null, "x"]}').b[2]""") == "x")
    assert(ex("""JSON.stringify({a: 1, b: 'two', c: [3, 4]})""") ==
      """{"a":1,"b":"two","c":[3,4]}""")
    assert(ex("""JSON.stringify({x: 1.5})""") == """{"x":1.5}""")
    assert(ex("""let o = JSON.parse('{"n": 123.4}'); o.n""") == 123.4)
    assert(ex("""JSON.stringify([1, 'a', false, null])""") ==
      """[1,"a",false,null]""")
    // undefined / functions are dropped from objects
    assert(ex("""JSON.stringify({a: undefined, b: 1})""") == """{"b":1}""")
    assert(ex("""JSON.parse(JSON.stringify({s: "q\"uote\n"})).s""") == "q\"uote\n")
  }

  test("typeof, delete, void, unary") {
    assert(ex("typeof 'x'") == "string")
    assert(ex("typeof 1") == "number")
    assert(ex("typeof true") == "boolean")
    assert(ex("typeof undefined") == "undefined")
    assert(ex("typeof {}") == "object")
    assert(ex("typeof []") == "object")
    assert(ex("typeof (() => 1)") == "function")
    assert(ex("typeof notDeclared") == "undefined")
    assert(ex("typeof null") == "object")
    assert(ex("!0") == true)
    assert(ex("~5") == -6L)
    assert(ex("void 0 === undefined") == true)
  }

  test("increment/decrement, compound assignment") {
    assert(ex("let i = 5; i++; i") == 6L)
    assert(ex("let i = 5; let j = i++; j") == 5L)
    assert(ex("let i = 5; let j = ++i; j") == 6L)
    assert(ex("let i = 5; i--; i") == 4L)
    assert(ex("let x = 2; x *= 3; x -= 1; x") == 5L)
    assert(ex("let s = 'a'; s += 'b'; s") == "ab")
    assert(ex("let a = [0]; a[0]++; a[0]") == 1L)
    assert(ex("let o = {n: 1}; o.n += 9; o.n") == 10L)
  }

  test("try/catch/finally and throw") {
    assert(ex(
      "let r = ''; try { throw new Error('boom'); } catch (e) { r = e.message; } r"
    ) == "boom")
    assert(ex(
      "let r = ''; try { null.x; } catch (e) { r = 'caught'; } r") == "caught")
    assert(ex(
      "let r = []; try { r.push('t'); } finally { r.push('f'); } r.join(',')"
    ) == "t,f")
    assert(ex(
      """let r = [];
        |try { try { throw 'inner'; } finally { r.push('fin'); } }
        |catch (e) { r.push(e); }
        |r.join(',')""".stripMargin) == "fin,inner")
    assert(ex(
      "try { JSON.parse('not json'); } catch (e) { 'parse failed' }"
    ) == "parse failed")
    assert(ex(
      "let e2; try { throw new TypeError('t'); } catch (e) { e2 = e instanceof Error; } e2"
    ) == true)
  }

  test("template literals") {
    assert(ex("let n = 'world'; `hello ${n}`") == "hello world")
    assert(ex("`1 + 1 = ${1 + 1}`") == "1 + 1 = 2")
    assert(ex("`${'a'.toUpperCase()}${2 * 2}`") == "A4")
  }

  test("ASI: statements without semicolons") {
    assert(ex(
      """let a = 1
        |let b = 2
        |a + b""".stripMargin) == 3L)
    assert(ex(
      """function f() {
        |  return
        |  1
        |}
        |f() === undefined""".stripMargin) == true)
  }

  test("call/apply/bind and arguments") {
    assert(ex(
      "function f() { return this.x; } f.call({x: 9})") == 9L)
    assert(ex(
      "function f(a, b) { return a + b; } f.apply(null, [2, 3])") == 5L)
    assert(ex(
      "function f(a, b) { return a * b; } let g = f.bind(null, 6); g(7)") == 42L)
    assert(ex(
      "function f() { return arguments.length; } f(1, 2, 3)") == 3L)
  }

  test("constructors via new") {
    assert(ex(
      """function Point(x, y) { this.x = x; this.y = y; }
        |let p = new Point(3, 4);
        |Math.sqrt(p.x * p.x + p.y * p.y)""".stripMargin) == 5L)
    assert(ex("new Error('msg').message") == "msg")
  }

  test("number-to-string formatting follows JS conventions") {
    assert(ex("'' + 2") == "2")       // integral prints without decimal
    assert(ex("'' + 2.5") == "2.5")
    assert(ex("'' + 0.1") == "0.1")
    assert(ex("[1/0, -1/0].join(',')") == "Infinity,-Infinity")
    assert(ex("'' + (0/0)") == "NaN")
  }

  test("export converts integral doubles to Long (goja int64 convention)") {
    assert(JsRuntime.export(run("Object.keys({a:1,b:2}).length")) == 2L)
    assert(JsRuntime.export(run("1.5")) == 1.5)
    val m = JsRuntime.export(run("({a: 2, b: 'x'})"))
      .asInstanceOf[java.util.Map[String, Any]]
    assert(m.get("a") == 2L)
    assert(m.get("b") == "x")
  }

  test("global state persists across run() calls (pooled VM contract)") {
    val vm = new JsInterp()
    vm.runSource("var counter = (typeof counter === 'undefined') ? 0 : counter; counter++;")
    vm.runSource("counter++;")
    assert(JsRuntime.export(vm.runSource("counter")) == 2L)
  }

  test("require() loads modules with module.exports") {
    val vm = new JsInterp(modules = Map(
      "blobber" -> "function blobber() { return 'blobber module'; }\nmodule.exports = blobber;"))
    assert(vm.runSource("const b = require('blobber'); b()") == "blobber module")
  }

  test("spread in calls and array literals") {
    assert(ex("Math.max(...[3, 1, 4, 1, 5])") == 5L)
    assert(ex("let a = [2, 3]; [1, ...a, 4].join(',')") == "1,2,3,4")
  }

  test("comma operator, sequence, nested ternary") {
    assert(ex("let x = (1, 2, 3); x") == 3L)
    assert(ex("let n = 5; n < 0 ? 'neg' : n === 0 ? 'zero' : 'pos'") == "pos")
  }

  test("deep structures and recursion") {
    assert(ex(
      """function fib(n) { return n < 2 ? n : fib(n-1) + fib(n-2); }
        |fib(15)""".stripMargin) == 610L)
    assert(ex(
      """function depth(o) {
        |  if (typeof o !== 'object' || o === null) return 0;
        |  let max = 0;
        |  for (let k in o) { let d = depth(o[k]); if (d > max) max = d; }
        |  return max + 1;
        |}
        |depth({a: {b: {c: 1}}, d: 2})""".stripMargin) == 3L)
  }
}
