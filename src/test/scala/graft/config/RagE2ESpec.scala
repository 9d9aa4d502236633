package graft.config

import graft.SparkSpec

/** The reference's RAG indexing + retrieval configs end-to-end (see
  * [[Rag]]): the returned rows are the pgvector store's single-chunk
  * documents; multi-chunk reassembly and the retrieval ranking are
  * require()-asserted inside the run.
  */
class RagE2ESpec extends SparkSpec {

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
