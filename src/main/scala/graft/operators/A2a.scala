package graft.operators

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

import graft.sources.Envelope

/** `a2a_message` processor (internal/impl/a2a — contract only, no
  * code ported: the wire surface is the PUBLIC A2A protocol, JSON-RPC
  * 2.0 over HTTP):
  *
  *   - the agent resolves through its AGENT CARD (`agent_card_url`
  *     GET → `{"url": …}` names the JSON-RPC endpoint);
  *   - `message/send` posts `{message:{role:"user",parts:[{kind:
  *     "text",text:…}],messageId}}`; the result is either a direct
  *     `message` or a `task`;
  *   - non-terminal tasks POLL `tasks/get` until a terminal state
  *     (completed/failed/canceled — processor_message.go:248);
  *   - `extract_text: true` (default) concatenates the text parts of
  *     the final agent message; false returns the full structured
  *     result.
  *
  * Scale shape: one agent client per partition, messages stream
  * through it (mapPartitions); a failed/errored task feeds the error
  * channel per message.
  */
object A2a {

  final class Client(cardUrl: String, client: Http.Client,
                     pollDelayMs: Long = 10, maxPolls: Int = 100) {
    private val mapper = new ObjectMapper()
    private var reqId = 0L

    lazy val endpoint: String = {
      val resp = client(Seq(Http.Request(cardUrl, "GET", Map.empty, ""))).head
      require(resp.status == 200,
        s"a2a: agent card fetch failed (${resp.status})")
      val card = mapper.readTree(resp.body)
      val url = card.path("url").asText("")
      require(url.nonEmpty, "a2a: agent card has no url")
      url
    }

    def rpc(method: String, paramsJson: String): JsonNode = {
      reqId += 1
      val body =
        s"""{"jsonrpc":"2.0","id":$reqId,"method":"$method","params":$paramsJson}"""
      val resp = client(Seq(Http.Request(endpoint, "POST",
        Map("Content-Type" -> "application/json"), body))).head
      require(resp.status == 200, s"a2a: rpc $method HTTP ${resp.status}")
      val root = mapper.readTree(resp.body)
      require(root.path("jsonrpc").asText == "2.0", "a2a: not a JSON-RPC 2.0 response")
      require(root.path("id").asLong == reqId,
        s"a2a: response id ${root.path("id")} != request id $reqId")
      if (root.has("error"))
        throw new IllegalStateException("a2a: " +
          root.path("error").path("message").asText("rpc error"))
      root.path("result")
    }

    private def terminal(state: String): Boolean =
      state == "completed" || state == "failed" || state == "canceled" ||
        state == "rejected"

    /** Send one text message, poll to terminal, return the result
      * node (a message, or a terminal task).
      */
    def send(text: String): JsonNode = {
      val msgId = java.util.UUID.randomUUID().toString
      val esc = text.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      var result = rpc("message/send",
        s"""{"message":{"role":"user","messageId":"$msgId","parts":[{"kind":"text","text":"$esc"}]}}""")
      if (result.path("kind").asText == "task") {
        var polls = 0
        while (!terminal(result.path("status").path("state").asText) &&
               polls < maxPolls) {
          if (pollDelayMs > 0) Thread.sleep(pollDelayMs)
          polls += 1
          result = rpc("tasks/get",
            s"""{"id":"${result.path("id").asText}"}""")
        }
        val state = result.path("status").path("state").asText
        if (state != "completed")
          throw new IllegalStateException(s"a2a: task ended in state $state")
      }
      result
    }

    /** The reference's extract_text: concatenated text parts of the
      * last agent message (task history) or the direct message.
      */
    def extractText(result: JsonNode): String = {
      val msg =
        if (result.path("kind").asText == "task") {
          val hist = result.path("history")
          var last: JsonNode = null
          hist.forEach(m => if (m.path("role").asText == "agent") last = m)
          if (last == null) result.path("status").path("message") else last
        } else result
      val sb = new StringBuilder
      msg.path("parts").forEach { p =>
        if (p.path("kind").asText("text") == "text")
          sb.append(p.path("text").asText)
      }
      sb.toString
    }
  }

  /** The processor: message content → agent → response content
    * (extract_text) or the full result object; failures per message
    * on the error channel.
    */
  def processor(df0: DataFrame, agentCardUrl: String,
                extractText: Boolean = true,
                client: Http.Client = null,
                pollDelayMs: Long = 10): DataFrame = {
    val df = Envelope.ensure(df0)
    val schema = df.schema
    val vIdx = schema.fieldIndex(Envelope.ValueCol)
    val eIdx = schema.fieldIndex(Envelope.ErrorCol)
    val urlV = agentCardUrl
    val extract = extractText
    val clientV = client
    val delayV = pollDelayMs
    df.mapPartitions { it =>
      val c = new Client(urlV,
        Option(clientV).getOrElse(A2a.clientFor(urlV)),
        pollDelayMs = delayV)
      it.map { row =>
        val vals = row.toSeq.toArray
        try {
          val result = c.send(row.getString(vIdx))
          vals(vIdx) =
            if (extract) c.extractText(result) else result.toString
        } catch {
          case e: Exception =>
            vals(eIdx) = Option(e.getMessage).getOrElse("a2a error")
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(ExpressionEncoder(RowEncoder.encoderFor(schema)))
  }

  // ---- in-memory agent (mem://name) ----

  /** A deterministic agent: answers `message/send` with a TASK that
    * completes only after `workPolls` `tasks/get` polls (the polling
    * contract), the final agent message being `transform(input)`.
    * `direct = true` answers with an immediate message instead.
    */
  final class MemAgent(name: String, transform: String => String,
                       workPolls: Int = 2, direct: Boolean = false) {
    private val mapper = new ObjectMapper()
    private val tasks = mutable.HashMap.empty[String, (String, Int)]
    @volatile var sends = 0
    @volatile var polls = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      if (q.verb == "GET")
        return Http.Response(200,
          s"""{"name":"$name","url":"mem://$name/rpc","capabilities":{}}""")
      val root = mapper.readTree(q.body)
      val id = root.path("id").asLong
      def ok(resultJson: String) = Http.Response(200,
        s"""{"jsonrpc":"2.0","id":$id,"result":$resultJson}""")
      root.path("method").asText match {
        case "message/send" =>
          sends += 1
          val sb = new StringBuilder
          root.path("params").path("message").path("parts").forEach { p =>
            if (p.path("kind").asText("text") == "text")
              sb.append(p.path("text").asText)
          }
          val answer = transform(sb.toString)
          if (direct)
            ok(s"""{"kind":"message","role":"agent","parts":[{"kind":"text","text":${quote(answer)}}]}""")
          else {
            val taskId = s"task-${sends}"
            tasks(taskId) = (answer, 0)
            ok(s"""{"kind":"task","id":"$taskId","status":{"state":"submitted"}}""")
          }
        case "tasks/get" =>
          polls += 1
          val taskId = root.path("params").path("id").asText
          tasks.get(taskId) match {
            case None => Http.Response(200,
              s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32001,"message":"task not found"}}""")
            case Some((answer, seen)) if seen + 1 < workPolls =>
              tasks(taskId) = (answer, seen + 1)
              ok(s"""{"kind":"task","id":"$taskId","status":{"state":"working"}}""")
            case Some((answer, _)) =>
              ok(s"""{"kind":"task","id":"$taskId","status":{"state":"completed"},"history":[{"role":"user","parts":[]},{"role":"agent","parts":[{"kind":"text","text":${quote(answer)}}]}]}""")
          }
        case other => Http.Response(200,
          s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32601,"message":"method not found: $other"}}""")
      }
    }

    private def quote(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemAgent]()

  def register(name: String, transform: String => String,
               workPolls: Int = 2, direct: Boolean = false): MemAgent =
    registry.computeIfAbsent(name,
      n => new MemAgent(n, transform, workPolls, direct))
  def agent(name: String): MemAgent = registry.get(name)
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(r => Option(registry.get(name)) match {
      case Some(a) => a.handle(r)
      case None => Http.Response(404, "no such agent")
    })

  def clientFor(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
