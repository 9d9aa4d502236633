package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.VectorStore.Point

/** Qdrant-shaped vector store contract through the injectable client
  * seam: metrics, upsert-by-id, delete, dim checks, the Spark
  * upsert/queryEnrich plumbing, and the config-runner output form.
  */
class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    "vss_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("metrics order neighbors correctly: cosine vs dot vs euclid") {
    val c = VectorStore.InMemory.named(fresh())
    for ((m, name) <- Seq("cosine" -> "c", "dot" -> "d", "euclid" -> "e"))
      c.createCollection(name, 2, m)
    // a: unit x; b: big y; q = (1, 0.1)
    val pts = Seq(Point(1, Array(1f, 0f)), Point(2, Array(0f, 10f)))
    Seq("c", "d", "e").foreach(c.upsert(_, pts))
    val q = Array(1f, 0.1f)
    assert(c.query("c", q, 1).head.id == 1, "cosine favors direction")
    assert(c.query("d", q, 1).head.id == 2, "dot favors magnitude")
    assert(c.query("e", q, 1).head.id == 1, "euclid favors proximity")
  }

  test("upsert overwrites by id; delete removes; dim mismatch rejects") {
    val c = VectorStore.InMemory.named(fresh())
    c.createCollection("x", 2, "cosine")
    c.upsert("x", Seq(Point(1, Array(1f, 0f), Map("v" -> "old"))))
    c.upsert("x", Seq(Point(1, Array(0f, 1f), Map("v" -> "new"))))
    assert(c.count("x") == 1)
    assert(c.query("x", Array(0f, 1f), 1).head.payload("v") == "new")
    c.delete("x", Seq(1L))
    assert(c.count("x") == 0)
    val e = intercept[IllegalArgumentException] {
      c.upsert("x", Seq(Point(2, Array(1f, 2f, 3f))))
    }
    assert(e.getMessage.contains("dim"))
  }

  test("Spark upsert + queryEnrich round-trip with payloads") {
    val name = fresh()
    VectorStore.InMemory.named(name).createCollection("docs", 3, "cosine")
    val df = Seq(
      (1L, Seq(1f, 0f, 0f), "alpha"),
      (2L, Seq(0f, 1f, 0f), "beta"),
      (3L, Seq(0.9f, 0.1f, 0f), "gamma"))
      .toDF("id", "vec", "tag")
    VectorStore.upsert(df, s"mem://$name", "docs", "id", "vec", Seq("tag"))
    assert(VectorStore.InMemory.named(name).count("docs") == 3)
    assert(VectorStore.InMemory.named(name)
      .query("docs", Array(1f, 0f, 0f), 1).head.payload("tag") == "alpha")
    val hits = VectorStore.queryEnrich(
        df.filter($"id" === 1), s"mem://$name", "docs", "vec", 2, "hits")
      .select(explode($"hits").as("h")).select($"h.id")
      .as[Long].collect().toSeq
    assert(hits == Seq(1L, 3L), "self first, then nearest by cosine")
  }

  test("config runner upserts points via interpolated id and vector_mapping") {
    val name = fresh()
    VectorStore.InMemory.named(name).createCollection("emb", 2, "cosine")
    val config =
      s"""input:
         |  generate: { count: 4, mapping: 'root.id = this.seq\nroot.v = [this.seq, 1]' }
         |output:
         |  qdrant:
         |    grpc_host: mem://$name
         |    collection_name: emb
         |    id: '$${! this.id }'
         |    vector_mapping: 'root = this.v'
         |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    val store = VectorStore.InMemory.named(name)
    assert(store.count("emb") == 4)
    // query near (3, 1): point id=3 is exact
    assert(store.query("emb", Array(3f, 1f), 1).head.id == 3L)
  }
}
