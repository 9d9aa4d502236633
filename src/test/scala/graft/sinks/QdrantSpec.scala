package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** qdrant REST contract (internal/impl/qdrant over the public API):
  * collection lifecycle, upsert-replace by id, dimension validation,
  * top-k search ordering, delete, count, api-key auth.
  */
class QdrantSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (String, Qdrant.MemQdrant) = {
    val name = "qd_" + java.util.UUID.randomUUID.toString.replace("-", "")
    (name, Qdrant.register(name, "qd-key"))
  }

  test("upsert replaces by id; count and delete work; search ranks by cosine") {
    val (name, _) = fresh()
    val url = s"mem://$name"
    Qdrant.createCollection(url, "qd-key", "vecs", 3)
    val df = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f))).toDF("id", "v")
    Qdrant.write(df, url, "qd-key", "vecs", col("id"), col("v"))
    // re-upsert id 1 with a new vector: replace, not duplicate
    Qdrant.write(Seq((1L, Array(0f, 0f, 1f))).toDF("id", "v"),
      url, "qd-key", "vecs", col("id"), col("v"))
    assert(Qdrant.count(url, "qd-key", "vecs") == 3L)
    val out = Qdrant.searchEnrich(
      Seq((0L, Array(1f, 0f, 0f))).toDF("q", "v"), url, "qd-key", "vecs",
      "v", 2, "hits").select(explode(col("hits")).as("h"))
      .select(col("h.id"), col("h.score")).as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(3L, 1L),
      "id 3 (~cos .994) first; ids 1 and 2 tie at cos 0 (1 moved away " +
        "by the re-upsert) and the tiebreak is id asc")
    Qdrant.delete(url, "qd-key", "vecs", Seq(3L))
    assert(Qdrant.count(url, "qd-key", "vecs") == 2L)
    Qdrant.drop(name)
  }

  test("dimension mismatch 400, unknown collection 404, bad api key 401") {
    val (name, srv) = fresh()
    val url = s"mem://$name"
    Qdrant.createCollection(url, "qd-key", "vecs", 3)
    intercept[Exception] { // wrong dimension rejected server-side
      Qdrant.write(Seq((1L, Array(1f, 0f))).toDF("id", "v"),
        url, "qd-key", "vecs", col("id"), col("v"))
    }
    intercept[Exception] { // unknown collection
      Qdrant.count(url, "qd-key", "nope")
    }
    intercept[Exception] { // bad key
      Qdrant.count(url, "WRONG", "vecs")
    }
    assert(srv.rejected > 0)
    Qdrant.drop(name)
  }
}
