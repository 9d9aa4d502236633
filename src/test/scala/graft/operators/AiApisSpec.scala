package graft.operators

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.S3.Credentials

/** Named AI processor variants (openai_* / ollama_* / cohere_* /
  * aws_bedrock_* / gcp_vertex_ai_*): wire-shape contracts against the
  * loopback server, SigV4 verification for Bedrock, and YAML
  * compilation of every name.
  */
class AiApisSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val yaml = new ObjectMapper(new YAMLFactory())

  private def withServer(test: AiApis.Server => Unit): Unit = {
    val srv = new AiApis.Server(apiKey = Some("sk-test"))
    try test(srv) finally srv.stop()
  }

  test("openai embeddings: md5 kernel, index re-ordering, auth enforced") {
    withServer { srv =>
      val texts = Seq("alpha", "beta", "gamma")
      val got = AiApis.openAiEmbeddings(srv.baseUrl, "sk-test", "m", 8)(texts)
      // the server returns data[] REVERSED; a correct client re-aligns
      // by index, so each row must equal its own md5 kernel vector
      texts.zip(got).foreach { case (t, v) =>
        assert(v.toSeq == AiApis.embedVector(t, 8).toSeq)
      }
      intercept[IllegalStateException] {
        AiApis.openAiEmbeddings(srv.baseUrl, "WRONG", "m", 8)(Seq("x"))
      }
    }
  }

  test("ollama/cohere/vertex embeddings speak their documented shapes") {
    withServer { srv =>
      val texts = Seq("one", "two")
      val want = texts.map(AiApis.embedVector(_, 8).toSeq)
      assert(AiApis.ollamaEmbeddings(srv.baseUrl, "m", 8)(texts)
        .map(_.toSeq) == want)
      assert(AiApis.cohereEmbeddings(srv.baseUrl, "sk-test", "m", 8)(texts)
        .map(_.toSeq) == want)
      assert(AiApis.vertexEmbeddings(srv.baseUrl, "p", "us-central1",
        "gecko", 8, "sk-test")(texts).map(_.toSeq) == want)
      // request shapes hit the right endpoints
      val paths = srv.requests.map(_._1)
      assert(paths.contains("/api/embed") && paths.contains("/v1/embed"))
      assert(paths.exists(_.endsWith(":predict")))
    }
  }

  test("bedrock: SigV4 verified server-side; wrong secret rejected") {
    withServer { srv =>
      val good = Credentials("AK", "SK")
      val got = AiApis.bedrockEmbeddings(srv.baseUrl, good, "titan-embed", 8)(
        Seq("doc"))
      assert(got.head.toSeq == AiApis.embedVector("doc", 8).toSeq)
      assert(AiApis.bedrockChat(srv.baseUrl, good, "titan-text")(Seq("hi"))
        == Seq(AiApis.chatDigest("hi")))
      intercept[IllegalStateException] {
        AiApis.bedrockEmbeddings(srv.baseUrl,
          Credentials("AK", "WRONG"), "titan-embed", 8)(Seq("doc"))
      }
    }
  }

  test("chat clients: openai/ollama/cohere return the md5 digest") {
    withServer { srv =>
      val want = Seq(AiApis.chatDigest("q1"))
      assert(AiApis.openAiChat(srv.baseUrl, "sk-test", "m")(Seq("q1")) == want)
      assert(AiApis.ollamaChat(srv.baseUrl, "m")(Seq("q1")) == want)
      assert(AiApis.cohereChat(srv.baseUrl, "sk-test", "m")(Seq("q1")) == want)
    }
  }

  test("moderation: openai flags and llama-guard verdict mapping") {
    withServer { srv =>
      assert(AiApis.openAiModeration(srv.baseUrl, "sk-test")(
        Seq("nice text", "very harmful text")) == Seq("false", "true"))
      assert(AiApis.ollamaModeration(srv.baseUrl, "llama-guard3")(
        Seq("nice", "harmful stuff")) == Seq("false", "true"))
    }
  }

  test("image generation returns a real decodable PNG of the asked size") {
    withServer { srv =>
      val b64 = AiApis.openAiImage(srv.baseUrl, "sk-test", "m", "24x16")(
        Seq("a red square")).head
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(b64)))
      assert(img.getWidth == 24 && img.getHeight == 16)
    }
  }

  test("speech bytes round-trip and transcription reads the multipart upload") {
    withServer { srv =>
      val b64 = AiApis.openAiSpeech(srv.baseUrl, "sk-test", "tts", "ash")(
        Seq("hello world")).head
      val audio = java.util.Base64.getDecoder.decode(b64)
      assert(audio.toSeq == AiApis.speechAudio("hello world", "ash").toSeq)
      // feed the audio back through transcription (multipart/form-data)
      val txt = AiApis.openAiAudioToText(srv.baseUrl, "sk-test", "whisper",
        "transcriptions")(Seq(b64)).head
      assert(txt == AiApis.transcript(audio))
      val tr = AiApis.openAiAudioToText(srv.baseUrl, "sk-test", "whisper",
        "translations")(Seq(b64)).head
      assert(tr == "en:" + AiApis.transcript(audio))
    }
  }

  test("cohere rerank orders by relevance and maps original indices") {
    withServer { srv =>
      val docs = Seq("the data pipeline", "unrelated words here",
        "pipeline engine for data")
      val got = AiApis.cohereRerank(srv.baseUrl, "sk-test", "m",
        "data pipeline engine", docs, 2)
      assert(got.map(_._1) == Seq(2, 0), "doc 2 matches 3/3, doc 0 2/3")
      assert(got.head._2 > got(1)._2)
    }
  }

  test("every named AI form compiles from YAML and runs offline") {
    import spark.implicits._
    val in = Seq((0L, """{"q":"hello"}""", Map.empty[String, String]))
      .toDF("__seq", "value", "metadata")
    def run(procYaml: String): DataFrame =
      graft.config.Processors.compile(yaml.readTree(procYaml), Map.empty)(in)
    val names = Seq(
      """openai_embeddings: { dimensions: 4 }""",
      """ollama_embeddings: { dimensions: 4 }""",
      """cohere_embeddings: { dimensions: 4 }""",
      """aws_bedrock_embeddings: { dimensions: 4 }""",
      """gcp_vertex_ai_embeddings: { dimensions: 4 }""")
    names.foreach { n =>
      val out = run(n).select("value").as[String].head()
      val vec = mapper.readTree(out)
      assert(vec.isArray && vec.size == 4, s"$n must emit a 4-dim vector")
    }
    val mod = run("""openai_moderation: {}""")
    assert(mod.select(element_at(col("metadata"), "moderation_flagged"))
      .as[String].head() == "false")
    val img = run("""openai_image_generation: {}""")
      .select("value").as[String].head()
    assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(img))) != null)
    val speech = run("""openai_speech: {}""").select("value").as[String].head()
    val audio = java.util.Base64.getDecoder.decode(speech)
    // chain: speech audio → transcription text
    val trIn = Seq((0L, speech, Map.empty[String, String]))
      .toDF("__seq", "value", "metadata")
    val txt = graft.config.Processors.compile(
      yaml.readTree("""openai_transcription: {}"""), Map.empty)(trIn)
      .select("value").as[String].head()
    assert(txt == AiApis.transcript(audio))
  }

  test("named embeddings form runs THROUGH the loopback wire from YAML") {
    import spark.implicits._
    withServer { srv =>
      val in = Seq((0L, "payload-text", Map.empty[String, String]))
        .toDF("__seq", "value", "metadata")
      val out = graft.config.Processors.compile(yaml.readTree(
        s"""openai_embeddings: { base_url: "${srv.baseUrl}", api_key: "sk-test", dimensions: 8 }"""),
        Map.empty)(in).select("value").as[String].head()
      val want = AiApis.embedVector("payload-text", 8)
      val got = mapper.readTree(out)
      assert(got.size == 8 &&
        math.abs(got.get(0).floatValue - want(0)) < 1e-6f)
      assert(srv.requests.exists(_._1 == "/v1/embeddings"))
    }
  }
}
