package graft.agent

import java.io.{BufferedReader, EOFException, InputStreamReader}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Locale

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.sources.{Http2, OtlpGrpc}

/** A guest agent program — the role a user's `agents/<name>.py` plays
  * under the reference's runtime (internal/agent/agent.go:162 spawns
  * guests; the SDK's `redpanda.runtime.serve` prints the handshake and
  * serves `AgentRuntime` over gRPC). This guest is the deterministic
  * stand-in used by specs and gates: it emits the `1|1|tcp|addr|grpc`
  * protocol line, serves `InvokeAgent` on the in-repo h2c stack, and —
  * in `tool:` mode — dispatches its work through the paired MCP server
  * (address from `REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER`, SSE
  * transport), exercising the full agent ⇄ MCP loop over real sockets.
  *
  * Modes (argv 0):
  *   - `upper`       — payload → upper-case, metadata `agent: upper`
  *   - `tool:<name>` — calls MCP tool `<name>` with `{"value": payload}`
  *     and returns the tool's text content as the new payload
  */
object AgentGuestMain {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("upper")
    // one MCP session PER SERVING THREAD: the runtime opens one h2c
    // connection per task, each served by its own thread here, and an
    // SSE session is a single ordered stream — sharing one would
    // interleave concurrent requests and strand responses
    val mcpSessions = new ThreadLocal[McpSseClient] {
      override def initialValue(): McpSseClient =
        new McpSseClient(sys.env.getOrElse(
          AgentRuntime.McpServerEnvVar,
          throw new IllegalStateException(
            s"${AgentRuntime.McpServerEnvVar} not set")))
    }
    def mcp: McpSseClient = mcpSessions.get()

    val transform: RuntimePb.Msg => RuntimePb.Msg = mode match {
      case "upper" => m =>
        RuntimePb.Msg(new String(m.payload, UTF_8)
          .toUpperCase(Locale.ROOT).getBytes(UTF_8),
          None, m.metadata + ("agent" -> "upper"), None)
      case t if t.startsWith("tool:") =>
        val toolName = t.stripPrefix("tool:")
        m => {
          val result = mcp.callTool(toolName,
            Map("value" -> new String(m.payload, UTF_8)))
          RuntimePb.Msg(result.getBytes(UTF_8), None,
            m.metadata + ("agent" -> "tool", "tool" -> toolName), None)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown guest mode: $other")
    }

    val server = new Http2.Server(endpoint => {
      var open = true
      while (open) {
        try {
          val (sid, headers, body, _) = endpoint.readMessage()
          val path = headers.toMap.getOrElse(":path", "")
          if (path != "/redpanda.runtime.v1alpha1.AgentRuntime/InvokeAgent") {
            endpoint.sendMessage(
              Seq(":status" -> "200", "content-type" -> "application/grpc"),
              Array.empty,
              Seq("grpc-status" -> "12",
                "grpc-message" -> s"unknown method $path"),
              stream = sid)
          } else {
            val (status, resp, errMsg) =
              try {
                val in = RuntimePb.decodeInvokeRequest(
                  OtlpGrpc.parseGrpcFrame(body))
                ("0", RuntimePb.encodeInvokeResponse(transform(in)), "")
              } catch {
                case e: Exception =>
                  ("13", RuntimePb.encodeInvokeResponse(RuntimePb.Msg(
                    Array.emptyByteArray, None, Map.empty, None)),
                    Option(e.getMessage).getOrElse("internal"))
              }
            endpoint.sendMessage(
              Seq(":status" -> "200", "content-type" -> "application/grpc"),
              OtlpGrpc.grpcFrame(resp),
              Seq("grpc-status" -> status) ++
                (if (errMsg.nonEmpty) Seq("grpc-message" -> errMsg)
                 else Seq.empty),
              stream = sid)
          }
        } catch {
          case _: EOFException => open = false
          case _: Exception => open = false
        }
      }
    })

    // the handshake line MUST be the first stdout output
    // (agent_processor.go:104: "do not log or print anything before")
    println(s"1|1|tcp|127.0.0.1:${server.port}|grpc")
    Console.out.flush()
    // serve until the runtime kills us
    Thread.currentThread().join()
  }

  /** Minimal MCP client over the HTTP+SSE transport: GET the SSE
    * stream, learn the session's message endpoint from the `endpoint`
    * event, POST JSON-RPC messages there, match responses by id on the
    * stream.
    */
  final class McpSseClient(sseUrl: String) {
    private val mapper = new ObjectMapper()
    private val base = {
      val u = URI.create(sseUrl)
      s"${u.getScheme}://${u.getHost}:${u.getPort}"
    }
    private val sseConn = URI.create(sseUrl).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    sseConn.setRequestMethod("GET")
    sseConn.setReadTimeout(30000)
    private val sse = new BufferedReader(
      new InputStreamReader(sseConn.getInputStream, UTF_8))

    /** Read the next SSE event as (event, data). */
    private def nextEvent(): (String, String) = {
      var event = "message"
      val data = new StringBuilder
      var line = sse.readLine()
      while (line != null && line.nonEmpty) {
        if (line.startsWith("event:")) event = line.drop(6).trim
        else if (line.startsWith("data:")) {
          if (data.nonEmpty) data.append('\n')
          data.append(line.drop(5).trim)
        }
        line = sse.readLine()
      }
      if (line == null && data.isEmpty)
        throw new EOFException("SSE stream closed")
      (event, data.toString)
    }

    private val endpoint: String = {
      val (ev, data) = nextEvent()
      require(ev == "endpoint", s"expected endpoint event, got $ev")
      base + data
    }

    private var nextId = 0

    private def request(method: String, params: ObjectNode): ObjectNode = {
      nextId += 1
      val id = nextId
      val req = mapper.createObjectNode()
      req.put("jsonrpc", "2.0"); req.put("id", id); req.put("method", method)
      req.set[ObjectNode]("params", params)
      post(mapper.writeValueAsString(req))
      // responses arrive on the SSE stream; match on id
      while (true) {
        val (ev, data) = nextEvent()
        if (ev == "message") {
          val node = mapper.readTree(data)
          if (node.path("id").asInt(-1) == id) {
            if (node.has("error"))
              throw new IllegalStateException(
                s"$method: ${node.at("/error/message").asText}")
            return node.get("result").asInstanceOf[ObjectNode]
          }
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def post(body: String): Unit = {
      val c = URI.create(endpoint).toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      c.setRequestMethod("POST")
      c.setDoOutput(true)
      c.setRequestProperty("Content-Type", "application/json")
      c.getOutputStream.write(body.getBytes(UTF_8))
      c.getOutputStream.close()
      require(c.getResponseCode / 100 == 2, s"POST ${c.getResponseCode}")
      c.getInputStream.close()
    }

    // handshake once per connection
    locally {
      val params = mapper.createObjectNode()
      params.put("protocolVersion", "2024-11-05")
      params.set[ObjectNode]("capabilities", mapper.createObjectNode())
      val info = params.putObject("clientInfo")
      info.put("name", "graft-guest"); info.put("version", "1.0.0")
      request("initialize", params)
      val note = mapper.createObjectNode()
      note.put("jsonrpc", "2.0")
      note.put("method", "notifications/initialized")
      post(mapper.writeValueAsString(note))
    }

    def listTools(): Seq[String] = {
      val res = request("tools/list", mapper.createObjectNode())
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      res.path("tools").elements().forEachRemaining(t =>
        out += t.path("name").asText)
      out.toSeq
    }

    def callTool(name: String, args: Map[String, String]): String = {
      val params = mapper.createObjectNode()
      params.put("name", name)
      val a = params.putObject("arguments")
      args.foreach { case (k, v) => a.put(k, v); () }
      val res = request("tools/call", params)
      if (res.path("isError").asBoolean(false))
        throw new IllegalStateException(
          s"tool $name failed: ${res.at("/content/0/text").asText}")
      res.at("/content/0/text").asText
    }
  }
}
