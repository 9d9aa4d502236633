package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Http

/** Pinecone output contracts over the public data-plane REST shapes
  * (internal/impl/pinecone/output.go operations — behaviors
  * re-asserted, no code ported).
  */
class PineconeSpec extends SparkSpec {
  import spark.implicits._

  private def freshName = "pct_" + java.util.UUID.randomUUID.toString.replace("-", "")

  private def vecDf(rows: (String, Seq[Float])*) =
    rows.toSeq.toDF("id", "vec")

  test("upsert inserts then replaces on the same id") {
    val name = freshName
    val url = s"mem://$name"
    val idx = Pinecone.named(name)
    Pinecone.write(vecDf("a" -> Seq(1f, 0f), "b" -> Seq(0f, 1f)),
      url, "upsert-vectors", col("id"), col("vec"), namespace = "ns")
    Pinecone.write(vecDf("a" -> Seq(0f, 2f)),
      url, "upsert-vectors", col("id"), col("vec"), namespace = "ns")
    val space = idx.namespaces("ns")
    assert(space.size == 2)
    assert(space("a")._1.toSeq == Seq(0f, 2f)) // replaced, not duplicated
    Pinecone.drop(name)
  }

  test("update-vector of a missing id is a 404 and fails the write") {
    val name = freshName
    Pinecone.named(name)
    val e = intercept[org.apache.spark.SparkException] {
      Pinecone.write(vecDf("ghost" -> Seq(1f, 1f)),
        s"mem://$name", "update-vector", col("id"), col("vec"))
    }
    assert(e.getMessage.contains("404") ||
      Option(e.getCause).exists(_.getMessage.contains("404")))
    Pinecone.drop(name)
  }

  test("update-vector sets values and metadata on an existing id") {
    val name = freshName
    val idx = Pinecone.named(name)
    val url = s"mem://$name"
    Pinecone.write(vecDf("a" -> Seq(1f, 0f)), url, "upsert-vectors",
      col("id"), col("vec"))
    Pinecone.write(
      vecDf("a" -> Seq(3f, 4f)).withColumn("meta", struct(lit("en").as("lang"))),
      url, "update-vector", col("id"), col("vec"), col("meta"))
    val (values, meta) = idx.namespaces("")("a")
    assert(values.toSeq == Seq(3f, 4f))
    assert(meta == """{"lang":"en"}""")
    Pinecone.drop(name)
  }

  test("delete-vectors removes ids; namespaces are isolated") {
    val name = freshName
    val idx = Pinecone.named(name)
    val url = s"mem://$name"
    Pinecone.write(vecDf("a" -> Seq(1f, 0f), "b" -> Seq(0f, 1f)),
      url, "upsert-vectors", col("id"), col("vec"), namespace = "n1")
    Pinecone.write(vecDf("a" -> Seq(1f, 1f)),
      url, "upsert-vectors", col("id"), col("vec"), namespace = "n2")
    Pinecone.write(vecDf("a" -> Seq(0f, 0f)), url, "delete-vectors",
      col("id"), namespace = "n1")
    assert(idx.namespaces("n1").keySet == Set("b"))
    assert(idx.namespaces("n2").keySet == Set("a")) // untouched
    Pinecone.drop(name)
  }

  test("query returns cosine top-k ordered desc with numeric-id tiebreak") {
    val name = freshName
    val url = s"mem://$name"
    Pinecone.named(name)
    Pinecone.write(vecDf(
      "1" -> Seq(1f, 0f), "2" -> Seq(0.9f, 0.1f), "3" -> Seq(0f, 1f),
      "10" -> Seq(1f, 0f)), // exact tie with "1"
      url, "upsert-vectors", col("id"), col("vec"))
    val out = Pinecone.queryEnrich(
        vecDf("q" -> Seq(1f, 0f)), url, "vec", 3, "hits")
      .select(explode(col("hits")).as("h"))
      .select(col("h.id"), round(col("h.score"), 4).as("s"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
    assert(out.map(_._1) == Seq("1", "10", "2")) // tie broken numerically
    assert(out.head._2 == 1.0)
    Pinecone.drop(name)
  }

  test("delete requires no vector mapping; upsert without one is rejected") {
    val name = freshName
    Pinecone.named(name)
    intercept[IllegalArgumentException] {
      Pinecone.write(vecDf("a" -> Seq(1f)), s"mem://$name",
        "upsert-vectors", col("id"), null)
    }
    intercept[IllegalArgumentException] {
      Pinecone.write(vecDf("a" -> Seq(1f)), s"mem://$name",
        "not-an-op", col("id"), col("vec"))
    }
    Pinecone.drop(name)
  }

  test("upsert batches chunk per partition (batchSize bounds request size)") {
    val name = freshName
    val idx = Pinecone.named(name)
    PineconeSpecState.requests.set(0)
    // capture only the name: the task-side client re-resolves the
    // shared instance (the mem:// convention) and bumps a static
    val nm = name
    val counting: Http.Client = reqs => {
      PineconeSpecState.requests.addAndGet(reqs.size)
      reqs.map(Pinecone.named(nm).handle)
    }
    val df = (1 to 25).map(i => (i.toString, Seq(i.toFloat))).toDF("id", "vec")
      .coalesce(1)
    Pinecone.write(df, s"mem://$name", "upsert-vectors", col("id"),
      col("vec"), batchSize = 10, client = counting)
    assert(idx.namespaces("").size == 25)
    // 25 rows / batchSize 10 → 3 requests (single partition, local run)
    assert(PineconeSpecState.requests.get() == 3)
    Pinecone.drop(name)
  }
}

object PineconeSpecState {
  val requests = new java.util.concurrent.atomic.AtomicInteger()
}
