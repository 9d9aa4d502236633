package graft.config

import graft.SparkSpec

/** The RAG trio's ingestion config end-to-end (see [[Rag.ingestE2E]]). */
class RagIngestSpec extends SparkSpec {

  test("git -> meta rename + binary drop -> kafka with header metadata") {
    val out = Rag.ingestE2E(spark, "/root/testdata/sf0.001", nDocs = 30)
      .collect()
    assert(out.length == 30)
    val paths = out.map(_.getString(0))
    assert(paths.forall(_.endsWith(".adoc")))
    assert(!paths.exists(_.contains("ROOT")))
    assert(!paths.exists(_.contains("binary")))
    assert(!paths.exists(_.contains("huge")))
    assert(paths.contains("modules/s0/doc_0.adoc"))
    assert(out.forall(_.getString(1).nonEmpty))
  }
}
