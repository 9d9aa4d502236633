package graft.operators

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}

import graft.sources.S3.{Credentials, SigV4}

/** Named AI processor variants over their PUBLIC REST wire shapes —
  * the reference's openai_* / ollama_* / cohere_* / aws_bedrock_* /
  * gcp_vertex_ai_* processor families (doc pages
  * processors/openai_embeddings.adoc:26, ollama_chat.adoc,
  * cohere_embeddings.adoc, aws_bedrock_chat.adoc,
  * gcp_vertex_ai_embeddings.adoc; impls internal/impl/{openai 1,777,
  * ollama 1,803, cohere 1,089} LoC ride official SDKs — contract only,
  * nothing to port).
  *
  * Each client speaks the documented JSON shape of its service:
  * OpenAI `/v1/embeddings|chat/completions|moderations|images/
  * generations|audio/speech|audio/transcriptions|audio/translations`,
  * Ollama `/api/chat|embed`, Cohere
  * `/v1/chat|embed|rerank`, Bedrock runtime `/model/{id}/invoke`
  * (SigV4-signed, server-verified), Vertex `…/models/{m}:predict`.
  * [[Server]] is the loopback counterpart: one HTTP server enforcing
  * auth + request shape per family and answering from DETERMINISTIC
  * kernels (md5 embeddings, md5 chat digests — NOT models) so the
  * correctness gates can reproduce every byte in ANSI SQL.
  *
  * Scale shape: clients plug into [[Embeddings.embedBatched]] /
  * [[Ai.chatCompletion]] — per-partition batches, no shuffle, executor
  * -side transport, concurrency = partitions.
  */
object AiApis {

  private def mapper = new ObjectMapper()

  // ─────────── deterministic kernels (server + offline clients) ───────────

  def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString
  def md5Hex(s: String): String = md5Hex(s.getBytes(UTF_8))

  /** Same formula as [[Embeddings.md5Batcher]] — SQL-reproducible. */
  def embedVector(text: String, dim: Int): Array[Float] =
    Embeddings.md5Batcher(dim)(Seq(text)).head

  /** Chat digest: SQL `'echo:' || SUBSTR(MD5(prompt), 1, 8)`. */
  def chatDigest(prompt: String): String = "echo:" + md5Hex(prompt).take(8)

  /** Moderation rule (deterministic, NOT a safety model). */
  def moderationFlag(text: String): Boolean =
    text.toLowerCase.contains("harmful")

  /** Transcription text derived from the audio bytes. */
  def transcript(audio: Array[Byte]): String =
    s"audio[${audio.length}]:${md5Hex(audio).take(12)}"

  /** Deterministic speech bytes: 16 md5 blocks chained over
    * (voice, text, i) — 256 bytes of fake audio.
    */
  def speechAudio(text: String, voice: String): Array[Byte] =
    (0 until 16).flatMap { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$voice:$text:$i".getBytes(UTF_8))
    }.toArray

  /** A REAL decodable PNG whose pixels derive from the prompt. */
  def imagePng(prompt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(prompt.getBytes(UTF_8))
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) % d.length
      val v = d(i) & 0xff
      img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((v * 7) & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Cohere rerank score — the [[Ai.lexicalScore]] formula, computed
    * on the server side so the gate's oracle stays SQL-expressible.
    */
  def rerankScore(query: String, doc: String): Double = {
    def toks(s: String) =
      s.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSet
    val q = toks(query)
    if (q.isEmpty) 0.0 else q.intersect(toks(doc)).size.toDouble / q.size
  }

  // ─────────────────────── transport helpers ───────────────────────

  private def postJson(client: Http.Client, url: String, body: String,
                       headers: Map[String, String]): JsonNode =
    postJsonBatch(client, Seq(url -> body), headers).head

  /** One transport round-trip for the whole batch: [[Http.javaClient]]
    * fans the requests out asynchronously, so N per-prompt API calls
    * cost ~one network round-trip, not N sequential ones.
    */
  private def postJsonBatch(client: Http.Client,
                            reqs: Seq[(String, String)],
                            headers: Map[String, String]): Seq[JsonNode] = {
    val rs = client(reqs.map { case (url, body) =>
      Http.Request(url, "POST",
        headers + ("Content-Type" -> "application/json"), body)
    })
    reqs.zip(rs).map { case ((url, _), r) =>
      if (r.status / 100 != 2)
        throw new IllegalStateException(s"POST $url -> ${r.status}: ${r.body}")
      mapper.readTree(r.body)
    }
  }

  /** Bytes-preserving POST (speech audio responses; [[Http.Client]]
    * carries String bodies, which corrupts binary).
    */
  private def postBytes(url: String, bodyBytes: Array[Byte],
                        headers: Map[String, String]): Array[Byte] = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = java.net.http.HttpClient.newHttpClient().send(
      b.POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bodyBytes))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"POST $url -> ${resp.statusCode()}: ${new String(resp.body(), UTF_8)}")
    resp.body()
  }

  private def bearer(key: String) = Map("Authorization" -> s"Bearer $key")

  private def jarr(xs: Seq[String]): String = {
    val a = mapper.createArrayNode()
    xs.foreach(a.add)
    a.toString
  }

  private def floats(n: JsonNode): Array[Float] =
    n.elements().asScala.map(_.floatValue).toArray

  // ─────────────────────────── embeddings ───────────────────────────

  /** Offline deterministic fallback (documented: NOT a model). */
  def offlineEmbeddings(dim: Int): Embeddings.Batcher =
    Embeddings.md5Batcher(dim)

  /** openai_embeddings: POST /v1/embeddings — array input, responses
    * re-ordered by their `index` field (the documented contract; a
    * client that trusts response order is the alignment bug the gate
    * exists to catch).
    */
  def openAiEmbeddings(baseUrl: String, apiKey: String, model: String,
                       dim: Int,
                       transport: Http.Client = Http.javaClient())
      : Embeddings.Batcher = texts => {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.set[JsonNode]("input", mapper.readTree(jarr(texts)))
    body.put("encoding_format", "float")
    body.put("dimensions", dim)
    val r = postJson(transport, s"$baseUrl/v1/embeddings", body.toString,
      bearer(apiKey))
    val byIndex = r.get("data").elements().asScala
      .map(e => e.get("index").asInt -> floats(e.get("embedding"))).toMap
    texts.indices.map(byIndex)
  }

  /** ollama_embeddings: POST /api/embed, embeddings ordered as sent. */
  def ollamaEmbeddings(baseUrl: String, model: String, dim: Int,
                       transport: Http.Client = Http.javaClient())
      : Embeddings.Batcher = texts => {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.set[JsonNode]("input", mapper.readTree(jarr(texts)))
    val r = postJson(transport, s"$baseUrl/api/embed", body.toString, Map.empty)
    r.get("embeddings").elements().asScala.map(floats).toSeq
  }

  /** cohere_embeddings: POST /v1/embed with `texts`. */
  def cohereEmbeddings(baseUrl: String, apiKey: String, model: String,
                       dim: Int,
                       transport: Http.Client = Http.javaClient())
      : Embeddings.Batcher = texts => {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.set[JsonNode]("texts", mapper.readTree(jarr(texts)))
    body.put("input_type", "search_document")
    val r = postJson(transport, s"$baseUrl/v1/embed", body.toString,
      bearer(apiKey))
    r.get("embeddings").elements().asScala.map(floats).toSeq
  }

  /** gcp_vertex_ai_embeddings: POST …/models/{m}:predict with
    * `instances[].content` → `predictions[].embeddings.values`.
    */
  def vertexEmbeddings(baseUrl: String, project: String, location: String,
                       model: String, dim: Int, apiKey: String = "token",
                       transport: Http.Client = Http.javaClient())
      : Embeddings.Batcher = texts => {
    val body = mapper.createObjectNode()
    val inst = body.putArray("instances")
    texts.foreach { t => inst.addObject().put("content", t); () }
    val url = s"$baseUrl/v1/projects/$project/locations/$location" +
      s"/publishers/google/models/$model:predict"
    val r = postJson(transport, url, body.toString, bearer(apiKey))
    r.get("predictions").elements().asScala
      .map(p => floats(p.at("/embeddings/values"))).toSeq
  }

  /** aws_bedrock_embeddings (Titan shape): one SigV4-signed
    * InvokeModel per text — `{"inputText"}` → `{"embedding"}`.
    */
  def bedrockEmbeddings(baseUrl: String, creds: Credentials, model: String,
                        dim: Int,
                        transport: Http.Client = Http.javaClient())
      : Embeddings.Batcher = texts =>
    signedInvokeBatch(transport, baseUrl, creds, model, texts.map { t =>
      val body = mapper.createObjectNode()
      body.put("inputText", t)
      body.put("dimensions", dim)
      body.toString
    }).map(r => floats(mapper.readTree(r).get("embedding")))

  /** Sign every invoke independently (each request carries its own
    * payload hash) but fan the whole batch out in ONE transport call.
    */
  private def signedInvokeBatch(transport: Http.Client, baseUrl: String,
                                creds: Credentials, model: String,
                                bodies: Seq[String]): Seq[String] = {
    val path = s"/model/$model/invoke"
    val host = baseUrl.stripPrefix("http://").stripPrefix("https://")
      .takeWhile(_ != '/')
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val rs = transport(bodies.map { body =>
      val payload = body.getBytes(UTF_8)
      val signed = SigV4.sign(creds, "bedrock", "POST", path, Map.empty,
        Map("host" -> host, "content-type" -> "application/json"),
        payload, amzDate)
      Http.Request(s"$baseUrl$path", "POST", Map(
        "Content-Type" -> "application/json",
        "x-amz-date" -> amzDate,
        "x-amz-content-sha256" -> signed.payloadHash,
        "Authorization" -> signed.authorization), body)
    })
    rs.map { r =>
      if (r.status / 100 != 2)
        throw new IllegalStateException(
          s"bedrock invoke -> ${r.status}: ${r.body}")
      r.body
    }
  }

  private def signedInvoke(transport: Http.Client, baseUrl: String,
                           creds: Credentials, model: String,
                           body: String): String =
    signedInvokeBatch(transport, baseUrl, creds, model, Seq(body)).head

  // ────────────────────────────── chat ──────────────────────────────

  def openAiChat(baseUrl: String, apiKey: String, model: String,
                 transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = prompts =>
    postJsonBatch(transport, prompts.map { p =>
      val body = mapper.createObjectNode()
      body.put("model", model)
      val msgs = body.putArray("messages")
      msgs.addObject().put("role", "user").put("content", p)
      s"$baseUrl/v1/chat/completions" -> body.toString
    }, bearer(apiKey)).map(_.at("/choices/0/message/content").asText)

  def ollamaChat(baseUrl: String, model: String,
                 transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = prompts =>
    postJsonBatch(transport, prompts.map { p =>
      val body = mapper.createObjectNode()
      body.put("model", model)
      body.put("stream", false)
      val msgs = body.putArray("messages")
      msgs.addObject().put("role", "user").put("content", p)
      s"$baseUrl/api/chat" -> body.toString
    }, Map.empty).map(_.at("/message/content").asText)

  def cohereChat(baseUrl: String, apiKey: String, model: String,
                 transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = prompts =>
    postJsonBatch(transport, prompts.map { p =>
      val body = mapper.createObjectNode()
      body.put("model", model)
      body.put("message", p)
      s"$baseUrl/v1/chat" -> body.toString
    }, bearer(apiKey)).map(_.get("text").asText)

  /** aws_bedrock_chat (Titan text shape): `{"inputText"}` →
    * `{"results":[{"outputText"}]}`, SigV4-signed.
    */
  def bedrockChat(baseUrl: String, creds: Credentials, model: String,
                  transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = prompts => prompts.map { p =>
    val body = mapper.createObjectNode()
    body.put("inputText", p)
    mapper.readTree(signedInvoke(transport, baseUrl, creds, model,
      body.toString)).at("/results/0/outputText").asText
  }

  // ──────────────── moderation / image / speech / audio ────────────────

  /** openai_moderation: flags as strings ("true"/"false") so the
    * result plugs into [[Ai.chatCompletion]]'s batching directly.
    */
  def openAiModeration(baseUrl: String, apiKey: String,
                       transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = texts => {
    val body = mapper.createObjectNode()
    body.set[JsonNode]("input", mapper.readTree(jarr(texts)))
    val r = postJson(transport, s"$baseUrl/v1/moderations", body.toString,
      bearer(apiKey))
    r.get("results").elements().asScala
      .map(_.get("flagged").asBoolean.toString).toSeq
  }

  /** ollama_moderation (llama-guard conversation shape): "safe" /
    * "unsafe" chat verdicts mapped to flags.
    */
  def ollamaModeration(baseUrl: String, model: String,
                       transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = texts =>
    ollamaChat(baseUrl, model, transport)(texts)
      .map(v => v.startsWith("unsafe").toString)

  def offlineModeration: Ai.ChatClient =
    texts => texts.map(t => moderationFlag(t).toString)

  /** cohere_rerank: (index, relevance_score) ordered by score desc. */
  def cohereRerank(baseUrl: String, apiKey: String, model: String,
                   query: String, documents: Seq[String], topN: Int,
                   transport: Http.Client = Http.javaClient())
      : Seq[(Int, Double)] = {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.put("query", query)
    body.set[JsonNode]("documents", mapper.readTree(jarr(documents)))
    body.put("top_n", topN)
    val r = postJson(transport, s"$baseUrl/v1/rerank", body.toString,
      bearer(apiKey))
    r.get("results").elements().asScala
      .map(e => (e.get("index").asInt, e.get("relevance_score").asDouble))
      .toSeq
  }

  /** openai_image_generation: b64_json PNG bytes per prompt. */
  def openAiImage(baseUrl: String, apiKey: String, model: String,
                  size: String,
                  transport: Http.Client = Http.javaClient())
      : Ai.ChatClient = prompts => prompts.map { p =>
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.put("prompt", p)
    body.put("n", 1)
    body.put("size", size)
    body.put("response_format", "b64_json")
    postJson(transport, s"$baseUrl/v1/images/generations", body.toString,
      bearer(apiKey)).at("/data/0/b64_json").asText
  }

  /** openai_speech: text → base64(audio bytes). */
  def openAiSpeech(baseUrl: String, apiKey: String, model: String,
                   voice: String): Ai.ChatClient = prompts =>
    prompts.map { p =>
      val body = mapper.createObjectNode()
      body.put("model", model)
      body.put("input", p)
      body.put("voice", voice)
      java.util.Base64.getEncoder.encodeToString(
        postBytes(s"$baseUrl/v1/audio/speech", body.toString.getBytes(UTF_8),
          bearer(apiKey) + ("Content-Type" -> "application/json")))
    }

  /** openai_transcription / openai_translation: base64 audio in the
    * message → multipart/form-data upload → text out.
    */
  def openAiAudioToText(baseUrl: String, apiKey: String, model: String,
                        endpoint: String): Ai.ChatClient = b64s =>
    b64s.map { b64 =>
      val audio = java.util.Base64.getDecoder.decode(b64)
      val boundary = "graft" + md5Hex(b64).take(16)
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes(UTF_8))
      w(s"--$boundary\r\n")
      w("Content-Disposition: form-data; name=\"file\"; filename=\"audio.wav\"\r\n")
      w("Content-Type: application/octet-stream\r\n\r\n")
      out.write(audio)
      w(s"\r\n--$boundary\r\n")
      w("Content-Disposition: form-data; name=\"model\"\r\n\r\n")
      w(model)
      w(s"\r\n--$boundary--\r\n")
      val resp = postBytes(s"$baseUrl/v1/audio/$endpoint", out.toByteArray,
        bearer(apiKey) +
          ("Content-Type" -> s"multipart/form-data; boundary=$boundary"))
      mapper.readTree(new String(resp, UTF_8)).get("text").asText
    }

  // ───────────────────────── loopback server ─────────────────────────

  /** One loopback server speaking every family's wire shape, strict on
    * auth and request structure, answering from the deterministic
    * kernels above. `creds` guards the Bedrock paths with full SigV4
    * re-derivation (the request is re-signed server-side and compared,
    * same as the S3/Lambda loopbacks).
    */
  final class Server(apiKey: Option[String] = None, dim: Int = 8,
                     creds: Credentials = Credentials("AK", "SK")) {
    private val server = JdkHttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => {
        val th = new Thread(r, "ai-api"); th.setDaemon(true); th
      })
    server.setExecutor(pool)
    server.createContext("/", (ex: HttpExchange) => route(ex))
    server.start()

    def port: Int = server.getAddress.getPort
    def baseUrl: String = s"http://127.0.0.1:$port"
    def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }

    /** Requests seen, for spec assertions: (path, body bytes). */
    val requests = scala.collection.mutable.Buffer.empty[(String, Array[Byte])]

    private def route(ex: HttpExchange): Unit = {
      try {
        val path = ex.getRequestURI.getPath
        val body = ex.getRequestBody.readAllBytes()
        requests.synchronized { requests += ((path, body)); () }
        val headers = ex.getRequestHeaders.asScala.collect {
          case (k, vs) if !vs.isEmpty => k.toLowerCase -> vs.get(0)
        }.toMap
        val resp: Either[(Int, String), Array[Byte]] =
          try handle(path, headers, body)
          catch {
            case e: IllegalArgumentException => Left((400, e.getMessage))
            case e: Exception => Left((500, String.valueOf(e.getMessage)))
          }
        resp match {
          case Left((status, msg)) =>
            val b = s"""{"error":{"message":"${msg.replace("\"", "'")}"}}"""
              .getBytes(UTF_8)
            ex.getResponseHeaders.set("Content-Type", "application/json")
            ex.sendResponseHeaders(status, b.length)
            ex.getResponseBody.write(b)
          case Right(bytes) =>
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    }

    private def requireBearer(headers: Map[String, String]): Unit =
      apiKey.foreach { k =>
        if (!headers.get("authorization").contains(s"Bearer $k"))
          throw new IllegalArgumentException("invalid api key")
      }

    private def req(n: JsonNode, field: String): JsonNode = {
      val v = n.get(field)
      if (v == null) throw new IllegalArgumentException(s"missing: $field")
      v
    }

    private def embedJson(texts: Seq[String], d: Int): Seq[JsonNode] =
      texts.map { t =>
        val a = mapper.createArrayNode()
        embedVector(t, d).foreach(a.add)
        a
      }

    private def handle(path: String, headers: Map[String, String],
                       body: Array[Byte]): Either[(Int, String), Array[Byte]] = {
      def json = mapper.readTree(new String(body, UTF_8))
      def ok(n: JsonNode) = Right(n.toString.getBytes(UTF_8))
      path match {
        // ── openai ──
        case "/v1/embeddings" =>
          requireBearer(headers)
          val j = json
          val texts = req(j, "input").elements().asScala.map(_.asText).toSeq
          val d = j.path("dimensions").asInt(dim)
          val o = mapper.createObjectNode()
          o.put("object", "list")
          o.put("model", req(j, "model").asText)
          val data = o.putArray("data")
          // deliberately REVERSED: the documented contract orders by
          // `index`, and a client trusting wire order misaligns
          embedJson(texts, d).zipWithIndex.reverse.foreach { case (v, i) =>
            val e = data.addObject()
            e.put("object", "embedding"); e.put("index", i)
            e.set[JsonNode]("embedding", v)
            ()
          }
          ok(o)
        case "/v1/chat/completions" =>
          requireBearer(headers)
          val j = json
          val msgs = req(j, "messages").elements().asScala.toSeq
          val prompt = msgs.reverse.find(_.path("role").asText == "user")
            .map(_.path("content").asText)
            .getOrElse(throw new IllegalArgumentException("no user message"))
          val o = mapper.createObjectNode()
          o.put("model", req(j, "model").asText)
          val ch = o.putArray("choices").addObject()
          ch.put("index", 0)
          ch.putObject("message").put("role", "assistant")
            .put("content", chatDigest(prompt))
          ch.put("finish_reason", "stop")
          ok(o)
        case "/v1/moderations" =>
          requireBearer(headers)
          val texts = req(json, "input").elements().asScala.map(_.asText).toSeq
          val o = mapper.createObjectNode()
          val rs = o.putArray("results")
          texts.foreach { t =>
            val r = rs.addObject()
            r.put("flagged", moderationFlag(t))
            r.putObject("categories").put("violence", moderationFlag(t))
            ()
          }
          ok(o)
        case "/v1/images/generations" =>
          requireBearer(headers)
          val j = json
          val size = j.path("size").asText("16x16")
          val Array(w, h) = size.split("x").map(_.toInt)
          val o = mapper.createObjectNode()
          val e = o.putArray("data").addObject()
          e.put("b64_json", java.util.Base64.getEncoder
            .encodeToString(imagePng(req(j, "prompt").asText, w, h)))
          ok(o)
        case "/v1/audio/speech" =>
          requireBearer(headers)
          val j = json
          Right(speechAudio(req(j, "input").asText,
            j.path("voice").asText("alloy")))
        case "/v1/audio/transcriptions" | "/v1/audio/translations" =>
          requireBearer(headers)
          val ct = headers.getOrElse("content-type", "")
          if (!ct.startsWith("multipart/form-data"))
            throw new IllegalArgumentException("expected multipart/form-data")
          val boundary = ct.split("boundary=")(1)
          val audio = multipartFile(body, boundary, "file")
          val text =
            if (path.endsWith("translations")) "en:" + transcript(audio)
            else transcript(audio)
          val o = mapper.createObjectNode(); o.put("text", text)
          ok(o)
        // ── ollama (no auth) ──
        case "/api/chat" =>
          val j = json
          val model = req(j, "model").asText
          val msgs = req(j, "messages").elements().asScala.toSeq
          val prompt = msgs.reverse.find(_.path("role").asText == "user")
            .map(_.path("content").asText).getOrElse("")
          val content =
            if (model.startsWith("llama-guard"))
              if (moderationFlag(prompt)) "unsafe\nS1" else "safe"
            else chatDigest(prompt)
          val o = mapper.createObjectNode()
          o.put("model", model)
          o.putObject("message").put("role", "assistant")
            .put("content", content)
          o.put("done", true)
          ok(o)
        case "/api/embed" =>
          val j = json
          val texts = req(j, "input").elements().asScala.map(_.asText).toSeq
          val o = mapper.createObjectNode()
          o.put("model", req(j, "model").asText)
          val arr = o.putArray("embeddings")
          embedJson(texts, dim).foreach(v => { arr.add(v); () })
          ok(o)
        // ── cohere ──
        case "/v1/chat" =>
          requireBearer(headers)
          val o = mapper.createObjectNode()
          o.put("text", chatDigest(req(json, "message").asText))
          ok(o)
        case "/v1/embed" =>
          requireBearer(headers)
          val texts = req(json, "texts").elements().asScala.map(_.asText).toSeq
          val o = mapper.createObjectNode()
          val arr = o.putArray("embeddings")
          embedJson(texts, dim).foreach(v => { arr.add(v); () })
          ok(o)
        case "/v1/rerank" =>
          requireBearer(headers)
          val j = json
          val query = req(j, "query").asText
          val docs = req(j, "documents").elements().asScala
            .map(_.asText).toVector
          val topN = j.path("top_n").asInt(docs.size)
          val o = mapper.createObjectNode()
          val rs = o.putArray("results")
          docs.zipWithIndex
            .map { case (doc, i) => (i, rerankScore(query, doc), doc) }
            .sortBy { case (_, s, doc) => (-s, doc) }
            .take(topN)
            .foreach { case (i, s, _) =>
              val r = rs.addObject()
              r.put("index", i); r.put("relevance_score", s)
              ()
            }
          ok(o)
        // ── bedrock runtime (SigV4-verified) ──
        case p if p.startsWith("/model/") && p.endsWith("/invoke") =>
          verifySigV4(headers, "POST", p, body).foreach(msg =>
            return Left((403, msg)))
          val j = json
          if (j.has("inputText") && j.has("dimensions")) {
            // titan embeddings
            val o = mapper.createObjectNode()
            val a = o.putArray("embedding")
            embedVector(j.get("inputText").asText,
              j.get("dimensions").asInt).foreach(a.add)
            ok(o)
          } else if (j.has("inputText")) {
            // titan text
            val o = mapper.createObjectNode()
            o.putArray("results").addObject()
              .put("outputText", chatDigest(j.get("inputText").asText))
            ok(o)
          } else throw new IllegalArgumentException("unknown model body")
        // ── vertex ──
        case p if p.endsWith(":predict") =>
          requireBearer(headers)
          val insts = req(json, "instances").elements().asScala.toSeq
          val o = mapper.createObjectNode()
          val preds = o.putArray("predictions")
          insts.foreach { inst =>
            val v = preds.addObject().putObject("embeddings")
            val a = v.putArray("values")
            embedVector(req(inst.asInstanceOf[ObjectNode], "content").asText,
              dim).foreach(a.add)
            ()
          }
          ok(o)
        case other => Left((404, s"no route: $other"))
      }
    }

    /** Full SigV4 re-derivation against the server's credentials. */
    private def verifySigV4(headers: Map[String, String], method: String,
                            path: String, payload: Array[Byte])
        : Option[String] = {
      val auth = headers.getOrElse("authorization",
        return Some("missing SigV4 authorization"))
      val amzDate = headers.getOrElse("x-amz-date", return Some("no date"))
      if (!headers.get("x-amz-content-sha256")
            .contains(SigV4.sha256Hex(payload)))
        return Some("payload hash mismatch")
      val expected = SigV4.sign(creds, "bedrock", method, path, Map.empty,
        Map("host" -> s"127.0.0.1:$port",
          "content-type" -> headers.getOrElse("content-type", "")),
        payload, amzDate)
      if (auth != expected.authorization) Some("signature mismatch") else None
    }

    /** Minimal multipart/form-data parser: bytes of the named file part. */
    private def multipartFile(body: Array[Byte], boundary: String,
                              name: String): Array[Byte] = {
      val marker = s"--$boundary".getBytes(UTF_8)
      def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
        var i = from
        while (i <= hay.length - needle.length) {
          var j = 0
          while (j < needle.length && hay(i + j) == needle(j)) j += 1
          if (j == needle.length) return i
          i += 1
        }
        -1
      }
      var pos = indexOf(body, marker, 0)
      while (pos >= 0) {
        val next = indexOf(body, marker, pos + marker.length)
        if (next < 0) return throwMissing(name)
        val headEnd = indexOf(body, "\r\n\r\n".getBytes(UTF_8), pos)
        if (headEnd < 0 || headEnd > next) return throwMissing(name)
        val head = new String(body, pos, headEnd - pos, UTF_8)
        if (head.contains(s"""name="$name"""")) {
          // content runs to the \r\n before the next boundary
          return java.util.Arrays.copyOfRange(body, headEnd + 4, next - 2)
        }
        pos = next
      }
      throwMissing(name)
    }
    private def throwMissing(name: String): Array[Byte] =
      throw new IllegalArgumentException(s"multipart part missing: $name")
  }
}
