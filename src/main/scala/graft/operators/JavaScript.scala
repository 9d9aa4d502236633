package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.js.{Builtins, JsInterp, JsParser, JsRuntime}
import graft.js.JsAst.Program
import graft.js.JsRuntime._
import graft.sources.Envelope

/** The `javascript` processor
  * (internal/impl/javascript/processor.go:56, functions.go:103-270 —
  * contract only, no code ported: the reference embeds the goja
  * library; this runs graft's own ES5-subset engine, `graft.js`).
  *
  * Per-message code execution with the reference's `benthos.v0_*` API:
  * `v0_msg_as_string` / `v0_msg_set_string` /
  * `v0_msg_as_structured` / `v0_msg_set_structured` /
  * `v0_msg_get_meta` (missing key THROWS "key not found") /
  * `v0_msg_set_meta` / `v0_msg_exists_meta` / `v0_fetch`, plus
  * `require()` over preloaded module sources (the reference's
  * `global_folders` NodeJS-style resolution).
  *
  * Runtime contract matches the reference's pooled-VM note
  * (processors/javascript.adoc): one VM per PARTITION, reused across
  * that partition's messages, so program-global state outlives
  * individual invocations and programs must self-encapsulate.
  *
  * Scale shape: the program parses ONCE on the driver (syntax errors
  * fail the plan, not per row); the serialized AST rides the closure;
  * execution is `mapPartitions` — no shuffle, no driver involvement,
  * the exact distribution class of every other row-kernel processor.
  * A JS exception that escapes the program marks the message's error
  * channel (processor error semantics) instead of failing the task.
  */
object JavaScript {

  /** Envelope metadata values are strings; structured meta values
    * (the reference keeps them dynamic) are JSON-encoded on write and
    * parsed back on read when they look structured.
    */
  private def metaEncode(v: Any): String = v match {
    case s: String => s
    case other => jsonStringify(other)
  }

  def processor(df0: DataFrame, code: String,
                modules: Map[String, String] = Map.empty,
                fetchClient: Http.Client = null): DataFrame = {
    val prog: Program = JsParser.parse(code) // driver-side: fail fast
    val df = Envelope.ensure(df0)
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val mIdx = schema.fieldIndex(Envelope.MetadataCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val client = fetchClient

    val out = df.mapPartitions { rows =>
      // one VM per partition, reused across messages (pooled contract)
      val state = new MessageState
      val vm = newVm(state, modules, client)
      rows.map { row =>
        state.value = row.getString(vIdx)
        state.meta = scala.collection.mutable.LinkedHashMap.empty
        val prior = row.getMap[String, String](mIdx)
        if (prior != null) prior.foreach { case (k, v) => state.meta(k) = v }
        var err: String = row.getString(eIdx)
        try vm.run(prog)
        catch {
          case e: JsError => err = JsRuntime.errMessage(e.value)
          case e: StackOverflowError => err = "js: stack overflow"
        }
        val vals = row.toSeq.toArray
        vals(vIdx) = state.value
        vals(mIdx) = state.meta.toMap
        vals(eIdx) = err
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
    out
  }

  private final class MessageState {
    var value: String = ""
    var meta: scala.collection.mutable.LinkedHashMap[String, String] =
      scala.collection.mutable.LinkedHashMap.empty
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def newVm(state: MessageState, modules: Map[String, String],
                    client: Http.Client): JsInterp = {
    val benthos = new JsObject
    def fn(name: String)(f: Seq[Any] => Any): Unit =
      benthos.set(name, new HostFunc(name, (_, args) => f(args)))

    fn("v0_msg_as_string")(_ => state.value)
    fn("v0_msg_set_string") { args =>
      state.value = toStr(args.headOption.getOrElse(JsUndefined))
      JsUndefined
    }
    fn("v0_msg_as_structured") { _ =>
      // parse failure throws a STRING (the reference surfaces the Go
      // json error as the thrown value; its tests bind `e` directly)
      try importValue(mapper.readValue(state.value, classOf[Object]))
      catch {
        case e: Exception => throw new JsError(
          Option(e.getMessage).getOrElse("invalid JSON").linesIterator
            .next())
      }
    }
    fn("v0_msg_set_structured") { args =>
      state.value = jsonStringify(args.headOption.getOrElse(null))
      JsUndefined
    }
    fn("v0_msg_exists_meta") { args =>
      state.meta.contains(toStr(args.headOption.getOrElse(JsUndefined)))
    }
    fn("v0_msg_get_meta") { args =>
      val k = toStr(args.headOption.getOrElse(JsUndefined))
      state.meta.get(k) match {
        case Some(v) => v
        case None => throw new JsError("key not found")
      }
    }
    fn("v0_msg_set_meta") { args =>
      val k = toStr(args.headOption.getOrElse(JsUndefined))
      state.meta(k) = metaEncode(args.lift(1).getOrElse(JsUndefined))
      JsUndefined
    }
    fn("v0_fetch") { args =>
      val url = toStr(args.headOption.getOrElse(JsUndefined))
      val headers: Map[String, String] = args.lift(1) match {
        case Some(o: JsObject) =>
          o.fields.map { case (k, v) => k -> toStr(v) }.toMap
        case _ => Map.empty
      }
      val verb = args.lift(2) match {
        case Some(JsUndefined) | None => "GET"
        case Some(v) => toStr(v)
      }
      val body = args.lift(3) match {
        case Some(JsUndefined) | None => ""
        case Some(v) => toStr(v)
      }
      val c = Option(client).getOrElse(Http.clientFor(url))
      val resp = c(Seq(Http.Request(url, verb, headers, body))).head
      val o = new JsObject
      o.set("status", resp.status.toDouble)
      o.set("body", resp.body)
      o
    }

    new JsInterp(hostGlobals = Map("benthos" -> benthos), modules = modules)
  }

  /** Load `global_folders`-style module sources driver-side: each
    * `.js` file under the folders becomes a require()-able module by
    * basename (with and without extension — NodeJS resolution).
    */
  def loadModules(folders: Seq[String]): Map[String, String] =
    folders.flatMap { dir =>
      val d = new java.io.File(dir)
      Option(d.listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".js"))
        .flatMap { f =>
          val src = new String(
            java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          val base = f.getName.stripSuffix(".js")
          Seq(base -> src, f.getName -> src)
        }
    }.toMap
}
