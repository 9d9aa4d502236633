package graft.agent

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

import graft.sources.{Http2, OtlpGrpc}

/** Agent runtime — the analog of the reference's `agent` CLI entry
  * point and `redpanda_agent_runtime` processor (contract:
  * internal/agent/agent_processor.go:49, internal/agent/agent.go:62).
  *
  * Shape: each message is handed to a GUEST process (the user's agent
  * program) over gRPC — `AgentRuntime.InvokeAgent`, carried on the
  * in-repo h2c stack ([[Http2]]) with the hand-rolled
  * `redpanda.runtime.v1alpha1` protobuf serde ([[RuntimePb]]). The
  * guest is spawned with the hashicorp-style handshake the reference
  * uses: first stdout line `1|1|tcp|<addr>|grpc`, MCP server address in
  * `REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER`, so the guest's tool
  * calls flow back through the [[graft.mcp.McpServer]] paired with the
  * agent.
  *
  * Scale design: guests pool PER JVM (one subprocess per executor per
  * distinct command, not per task) and each task opens its own h2c
  * connection — the same executor-side client seam as the wasm/js/ffi
  * plugin runtimes. Rows stream one InvokeAgent call at a time, so
  * driver memory never holds the corpus.
  */
object AgentRuntime {

  /** Env var the reference exports to guests (agent_processor.go:137). */
  val McpServerEnvVar = "REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER"

  /** The bundled reference PYTHON guest (the role `agents/<name>.py`
    * plays under the reference's `uv run` default —
    * agent_processor.go:92, internal/agent/template/
    * redpanda_agents.yaml), extracted from the classpath to a temp
    * file. It speaks the same ABI as the JVM stand-in guest — the
    * handshake line, InvokeAgent over h2c gRPC, MCP tool calls over
    * SSE — from the Python standard library alone, proving the
    * runtime's contract is language-neutral rather than an artifact of
    * the in-repo h2c stack talking to itself.
    */
  lazy val pythonGuestScript: java.nio.file.Path = {
    val in = getClass.getResourceAsStream("/graft/agent/agent_guest.py")
    require(in != null, "bundled agent_guest.py resource missing")
    val p = java.nio.file.Files.createTempFile("agent_guest", ".py")
    try java.nio.file.Files.copy(in, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    p.toFile.deleteOnExit()
    p
  }

  private final case class Guest(process: Process, host: String, port: Int)

  /** Guest pool, keyed by (command, mcp address, cwd) — one live guest
    * per executor JVM per distinct agent config.
    */
  private val guests = TrieMap.empty[String, Guest]

  sys.addShutdownHook {
    guests.values.foreach(g => g.process.destroyForcibly())
  }

  private def guestKey(command: Seq[String], mcpServer: String,
                       cwd: String): String =
    (command :+ mcpServer :+ cwd).mkString("\u0000")

  /** Spawn (or reuse) the guest and return its gRPC address. The
    * handshake is the reference's: the FIRST stdout line must be
    * `1|1|tcp|host:port|grpc` within 10 s (agent_processor.go:92-126).
    */
  private def acquireGuest(command: Seq[String], mcpServer: String,
                           cwd: String): Guest = {
    val key = guestKey(command, mcpServer, cwd)
    guests.synchronized {
      guests.get(key).filter(_.process.isAlive).getOrElse {
        val pb = new ProcessBuilder(command: _*)
        if (cwd.nonEmpty) pb.directory(new java.io.File(cwd))
        pb.environment().put(McpServerEnvVar, mcpServer)
        pb.redirectErrorStream(false)
        val p = pb.start()
        // stderr is the guest's log channel — drain it so a chatty
        // guest can't block on a full pipe
        val drainer = new Thread(() => {
          val in = p.getErrorStream
          val buf = new Array[Byte](8192)
          while (in.read(buf) >= 0) {}
        })
        drainer.setDaemon(true); drainer.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream, UTF_8))
        val lineF = java.util.concurrent.CompletableFuture.supplyAsync(
          () => reader.readLine())
        val line = try lineF.get(10, java.util.concurrent.TimeUnit.SECONDS)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            p.destroyForcibly()
            throw new IllegalStateException(
              "starting agent process: timeout waiting for protocol line")
        }
        val parts = Option(line).map(_.trim.split("\\|")).getOrElse(Array.empty)
        if (parts.length != 5 || parts(0) != "1" || parts(1) != "1" ||
            parts(2) != "tcp" || parts(4) != "grpc") {
          p.destroyForcibly()
          throw new IllegalStateException(
            s"invalid agent protocol line: '$line' — the guest must " +
              "emit the runtime handshake before any other stdout")
        }
        val addr = parts(3).split(":", 2)
        val g = Guest(p, addr(0), addr(1).toInt)
        guests.put(key, g)
        g
      }
    }
  }

  /** Tear down the pooled guest for this exact config (gates call this
    * after materializing so repeated bench passes don't accumulate
    * idle guest processes).
    */
  def releaseGuest(command: Seq[String], mcpServer: String,
                   cwd: String = ""): Unit =
    guests.remove(guestKey(command, mcpServer, cwd))
      .foreach(_.process.destroyForcibly())

  private val invokePath =
    "/redpanda.runtime.v1alpha1.AgentRuntime/InvokeAgent"

  /** One InvokeAgent call over an open h2c connection. */
  def invoke(ep: Http2.Endpoint, host: String, port: Int,
             msg: RuntimePb.Msg): RuntimePb.Msg = {
    ep.sendMessage(Seq(
      ":method" -> "POST", ":scheme" -> "http",
      ":path" -> invokePath, ":authority" -> s"$host:$port",
      "content-type" -> "application/grpc", "te" -> "trailers"),
      OtlpGrpc.grpcFrame(RuntimePb.encodeInvokeRequest(msg)))
    val (_, headers, body, trailers) = ep.readMessage()
    val status = (trailers ++ headers).toMap.getOrElse("grpc-status", "?")
    if (status != "0") {
      val detail = (trailers ++ headers).toMap.getOrElse("grpc-message", "")
      throw new IllegalStateException(s"InvokeAgent grpc-status $status $detail")
    }
    RuntimePb.decodeInvokeResponse(OtlpGrpc.parseGrpcFrame(body))
  }

  /** The `redpanda_agent_runtime` processor over the pipeline envelope
    * (`value`/`metadata`/`error`): every non-errored row makes one
    * InvokeAgent round-trip to the pooled guest; guest-reported errors
    * land in the error channel, like every processor here.
    */
  def processor(df: DataFrame, command: Seq[String], mcpServer: String,
                cwd: String = ""): DataFrame = {
    require(command.nonEmpty, "command must be specified")
    val hasMeta = df.columns.contains("metadata")
    val base =
      if (df.columns.contains("error")) df
      else df.withColumn("error", org.apache.spark.sql.functions.lit(null)
        .cast("string"))
    val vIdx = base.schema.fieldIndex("value")
    val eIdx = base.schema.fieldIndex("error")
    val mIdx = if (hasMeta) base.schema.fieldIndex("metadata") else -1
    val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(base.schema))
    base.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val g = acquireGuest(command, mcpServer, cwd)
        val ep = Http2.connect(g.host, g.port)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => ep.close()))
        rows.map { row =>
          if (row.getString(eIdx) != null) row
          else {
            val meta =
              if (mIdx >= 0 && !row.isNullAt(mIdx))
                row.getMap[String, String](mIdx).toMap
              else Map.empty[String, String]
            try {
              val value = Option(row.getString(vIdx)).getOrElse("")
              val out = invoke(ep, g.host, g.port,
                RuntimePb.Msg(value.getBytes(UTF_8), None, meta, None))
              val newValue = out.structured match {
                case Some(v) => v.toString
                case None => new String(out.payload, UTF_8)
              }
              val vals = row.toSeq.toArray
              vals(vIdx) = newValue
              out.error match {
                case Some(err) => vals(eIdx) = s"agent: $err"
                case None => ()
              }
              if (mIdx >= 0 && out.metadata.nonEmpty)
                vals(mIdx) = meta ++ out.metadata
              Row.fromSeq(vals.toIndexedSeq)
            } catch {
              case e: Exception =>
                val vals = row.toSeq.toArray
                vals(eIdx) = s"agent failed: ${e.getMessage}"
                Row.fromSeq(vals.toIndexedSeq)
            }
          }
        }
      }
    }(enc)
  }

  // ── the `agent` entry point: redpanda_agents.yaml ──────────────────

  private val yaml = new ObjectMapper(new YAMLFactory())
  private val json = new ObjectMapper()

  final case class AgentResult(name: String, output: DataFrame,
                               mcp: graft.mcp.McpServer#HttpSse)

  /** The runner's HTTP surface (agent.go:185 — `http:` block of
    * redpanda_agents.yaml, default enabled on 0.0.0.0:4195; here bound
    * to loopback with port 0 = ephemeral for tests): POST
    * `/<agent>/invoke` runs ONE message through the agent's processor
    * chain synchronously and returns the transformed payload — the
    * sync-response surface a caller uses to probe a running agent.
    */
  final class HttpGateway(agents: Map[String, String => String],
                          bindPort: Int) {
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", bindPort), 16)
    agents.foreach { case (name, invokeFn) =>
      server.createContext(s"/$name/invoke", ex => {
        try {
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val out = invokeFn(body).getBytes(UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/octet-stream")
          ex.sendResponseHeaders(200, out.length.toLong)
          ex.getResponseBody.write(out)
        } catch {
          case e: Exception =>
            val msg = Option(e.getMessage).getOrElse("error").getBytes(UTF_8)
            ex.sendResponseHeaders(500, msg.length.toLong)
            ex.getResponseBody.write(msg)
        } finally ex.close()
      })
    }
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Run every agent in `<repositoryDir>/redpanda_agents.yaml`
    * (agent.go:62): each agent gets its own MCP server over
    * `<repositoryDir>/mcp` filtered to its `tools`, its guest command
    * (the reference pins `uv run agents/<name>.py`; a `command` list
    * field overrides it for non-python guests), and an
    * input → agent → output pipeline through [[graft.config.Pipeline]].
    */
  def run(spark: SparkSession, repositoryDir: String,
          env: Map[String, String] = Map.empty): Seq[AgentResult] =
    runWithGateway(spark, repositoryDir, env)._1

  /** [[run]] plus the `http:` gateway when the config asks for one
    * (`http.enabled`, `http.address` — agent.go:185; the reference
    * default is enabled on 0.0.0.0:4195, here OPT-IN because a library
    * embedder decides its own listening surface).
    */
  def runWithGateway(spark: SparkSession, repositoryDir: String,
                     env: Map[String, String] = Map.empty)
      : (Seq[AgentResult], Option[HttpGateway]) = {
    val cfgPath = java.nio.file.Paths.get(repositoryDir,
      "redpanda_agents.yaml")
    require(java.nio.file.Files.exists(cfgPath),
      s"reading redpanda_agents.yaml (are you in the right directory?)")
    val root = yaml.readTree(java.nio.file.Files.readString(cfgPath))
    // MCP bind surface: `mcp.address` (host:port; port 0 = ephemeral —
    // required when more than one agent runs, each gets its own server).
    // The default is loopback, which only works when executors share the
    // driver's network namespace, i.e. local mode — the processor spawns
    // guests per EXECUTOR JVM, so a cluster deployment must bind a
    // reachable interface (the reference defaults to 0.0.0.0).
    val mcpAddr = root.at("/mcp/address").asText("127.0.0.1:0")
    val sep = mcpAddr.lastIndexOf(':')
    require(sep > 0, s"mcp.address must be host:port, got '$mcpAddr'")
    val (mcpHost, mcpPort) = (mcpAddr.take(sep), mcpAddr.drop(sep + 1).toInt)
    val loopbackBind = mcpHost == "127.0.0.1" || mcpHost == "localhost"
    require(spark.sparkContext.isLocal || !loopbackBind,
      "agent runtime on a multi-node master needs a guest-reachable MCP " +
        "bind: set mcp.address in redpanda_agents.yaml (e.g. 0.0.0.0:0) — " +
        "executor-side guests cannot dial the driver's loopback")
    val agents = Option(root.get("agents")).map(_.properties().asScala.toSeq)
      .getOrElse(Seq.empty)
    require(mcpPort == 0 || agents.size <= 1,
      "mcp.address with a fixed port only supports a single agent " +
        "(each agent runs its own MCP server); use port 0")
    val results = agents.map { e =>
      val name = e.getKey
      val a = e.getValue
      val tools = Option(a.get("tools"))
        .map(_.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty)
      val mcpServer = new graft.mcp.McpServer(spark,
        java.nio.file.Paths.get(repositoryDir, "mcp").toString,
        labelFilter = tools.contains, env = env)
      val http = mcpServer.serveHttp(mcpHost, mcpPort)
      // default guest command: the reference pins `uv run agents/<name>.py`
      // (agent_processor.go:92); when uv is absent from PATH the runner
      // falls back to plain python3 so Python guests still run — the
      // script is the contract, uv is only its launcher
      val command = Option(a.get("command"))
        .map(_.elements().asScala.map(_.asText).toSeq)
        .getOrElse {
          val uvOnPath = sys.env.getOrElse("PATH", "").split(':')
            .exists(p => p.nonEmpty &&
              java.nio.file.Files.isExecutable(java.nio.file.Paths.get(p, "uv")))
          if (uvOnPath) Seq("uv", "run", s"agents/$name.py")
          else Seq("python3", s"agents/$name.py")
        }
      val cfg = json.createObjectNode()
      cfg.set[com.fasterxml.jackson.databind.JsonNode]("input",
        a.get("input").deepCopy())
      val proc = cfg.putObject("pipeline").putArray("processors")
        .addObject().putObject("redpanda_agent_runtime")
      val cmdArr = proc.putArray("command")
      command.foreach(cmdArr.add)
      proc.put("mcp_server", http.sseUrl)
      proc.put("cwd", repositoryDir)
      Option(a.get("output")).foreach(o =>
        cfg.set[com.fasterxml.jackson.databind.JsonNode]("output",
          o.deepCopy()))
      val out = graft.config.Pipeline.run(spark,
        yaml.writeValueAsString(cfg), env)
      (AgentResult(name, out, http), command, http.sseUrl)
    }
    val gateway = Option(root.get("http"))
      .filter(_.path("enabled").asBoolean(true))
      .map { h =>
        // bind: the reference default is 0.0.0.0:4195; port 0 = ephemeral
        val addr = h.path("address").asText("127.0.0.1:0")
        val port = addr.split(":").last.toInt
        val invokers = results.map { case (r, command, sseUrl) =>
          r.name -> { (body: String) =>
            val g = acquireGuest(command, sseUrl, repositoryDir)
            val ep = Http2.connect(g.host, g.port)
            try {
              val out = invoke(ep, g.host, g.port,
                RuntimePb.Msg(body.getBytes(UTF_8), None, Map.empty, None))
              out.error.foreach(err =>
                throw new IllegalStateException(s"agent: $err"))
              out.structured.map(_.toString)
                .getOrElse(new String(out.payload, UTF_8))
            } finally ep.close()
          }
        }.toMap
        new HttpGateway(invokers, port)
      }
    (results.map(_._1), gateway)
  }
}
