package graft.config

import graft.SparkSpec

/** The reference's RAG indexing + retrieval configs end-to-end (see
  * [[Rag]]): the returned rows are the pgvector store's single-chunk
  * documents; multi-chunk reassembly and the retrieval ranking are
  * require()-asserted inside the run.
  */
class RagE2ESpec extends SparkSpec {

  test("cohere and ollama variant configs build through the runner") {
    Rag.registerTemplates()
    val env = Map("REDPANDA_BROKERS" -> "mem://rag-var-build",
      "INDEXING_CONSUMER" -> "g", "REDPANDA_USER" -> "",
      "REDPANDA_PASS" -> "", "COHERE_API_KEY" -> "k",
      "POSTGRES_DSN" -> "postgres://ragvar/db", "POSTGRES_TABLE" -> "rag")
    graft.sources.Broker.transportFor("mem://rag-var-build")
      .createTopic("rp.ai.rag.x", 1)
    Seq("indexing/cohere_pgvector.yaml", "indexing/ollama_pgvector.yaml")
      .foreach { f =>
        // build = full plan construction (templates expand, every
        // processor compiles); output compilation is covered by the
        // openai run since all three share the pgvector template
        Pipeline.build(spark,
          Pipeline.substEnv(Rag.resource(f), env), env)
      }
    Seq("retrieval/cohere_pgvector.yaml", "retrieval/ollama_pgvector.yaml")
      .foreach { f =>
        new graft.sources.HttpSyncServer(spark,
          Pipeline.substEnv(Rag.resource(f), env), env).stop()
      }
  }

  test("indexing stores every single-chunk doc verbatim; retrieval ranks " +
       "by the posted body's embedding") {
    val out = Rag.e2e(spark, "/root/testdata/sf0.001", nSmall = 8,
      nBig = 6, nQueries = 4).collect()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getString(0) == "rp.ai.rag.docs")
      assert(r.getLong(2) == 0L)
      assert(r.getString(3).nonEmpty)
    }
  }
}
