package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batching/alignment invariants of the embedding operator: vectors
  * align to their rows across batch boundaries, batch sizing is
  * honored, and empty texts don't call the model.
  */
class EmbeddingsSpec extends SparkSpec {

  test("vectors align with rows across batches; empties embed as null") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, if (i % 7 == 0) "" else s"text $i"))
      .toDF("id", "text").repartition(2)
    val out = Embeddings.embedBatched(df, "text", "emb", 8,
      texts => texts.map(t => Array(t.length.toFloat, t.hashCode.toFloat)))
      .select(col("id"), col("text"), col("emb")).collect()
    out.foreach { r =>
      val text = r.getString(1)
      if (text.isEmpty) assert(r.isNullAt(2), s"empty text must embed null")
      else {
        val e = r.getSeq[Float](2)
        assert(e(0) == text.length.toFloat && e(1) == text.hashCode.toFloat,
          s"vector misaligned for '$text'")
      }
    }
  }

  test("batch size is honored (no oversized model calls)") {
    import spark.implicits._
    val df = (0 until 33).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(1)
    // the batcher reports its own batch size through the vector, so the
    // observation survives closure serialization in executor tasks
    val observed = Embeddings.embedBatched(df, "text", "emb", 10,
        texts => texts.map(_ => Array(texts.length.toFloat)))
      .select(element_at(col("emb"), 1)).collect().map(_.getFloat(0).toInt)
    assert(observed.length == 33)
    assert(observed.forall(_ <= 10), s"oversized batch: ${observed.max}")
    assert(observed.count(_ == 10) == 30 && observed.count(_ == 3) == 3,
      "expected batches of 10,10,10,3")
  }

  test("hash batcher is deterministic and unit-ranged") {
    val v1 = Embeddings.hashBatcher(16)(Seq("alpha", "beta"))
    val v2 = Embeddings.hashBatcher(16)(Seq("alpha", "beta"))
    assert(v1.map(_.toSeq) == v2.map(_.toSeq))
    assert(v1.forall(_.forall(x => x >= -1f && x <= 1f)))
    assert(v1(0).toSeq != v1(1).toSeq)
  }
}
