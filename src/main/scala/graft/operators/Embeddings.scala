package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding generation for training-data pipelines — the Spark form of
  * the reference's AI embedding processors (e.g. docs/modules/
  * components/pages/processors/openai_embeddings.adoc:26,
  * cohere_embeddings.adoc:26): texts go to a model endpoint in BATCHES,
  * vectors come back as `array<float>`.
  *
  * The transport is a pluggable `Batcher` so the operator is testable
  * offline: [[hashBatcher]] is a deterministic fake (documented, NOT a
  * model); production wires an HTTP client with the same signature.
  *
  * Scale shape: mapPartitions — batching happens inside each partition,
  * so concurrency = partitions, no shuffle, and backpressure is the
  * executor's own task slots (the reference throttles the same way via
  * its `parallel`/`rate_limit` wrappers). Batch size trades request
  * count against payload size exactly like the reference's
  * `dimensions`/batching knobs.
  */
object Embeddings {

  /** One model round-trip: N texts in, N vectors out (order-aligned). */
  type Batcher = Seq[String] => Seq[Array[Float]]

  /** Deterministic offline stand-in for a model endpoint: vector slot j
    * = unit-scaled hash of (token-set, j). NOT an embedding model —
    * exists so the batching/partitioning plumbing has a verifiable
    * kernel in environments without model access.
    */
  def hashBatcher(dim: Int): Batcher = texts =>
    texts.map { t =>
      val h0 = scala.util.hashing.MurmurHash3.stringHash(t)
      Array.tabulate(dim) { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((h0, j))
        (h.toFloat / Int.MaxValue)
      }
    }

  /** Like [[hashBatcher]] but with md5 as the slot hash: component j =
    * lower-32-bit word of md5(text ":" j), unit-scaled — chosen because
    * ANSI SQL can reproduce it, so the CORRECTNESS gate verifies per-row
    * ALIGNMENT of batched outputs (the real failure mode of a batching
    * transport: vectors shifted one row off). NOT a model.
    */
  def md5Batcher(dim: Int): Batcher = texts =>
    texts.map { t =>
      Array.tabulate(dim) { j =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest((t + ":" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val v = ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
          ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
        (v.toDouble / 4294967295.0).toFloat
      }
    }

  /** Append `outCol` (array<float>) by calling `batcher` over batches of
    * `batchSize` texts within each partition. Null/empty texts embed as
    * null without consuming batch slots.
    */
  def embedBatched(df: DataFrame, textCol: String, outCol: String,
                   batchSize: Int, batcher: Batcher): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType)))
    val textIdx = df.schema.fieldIndex(textCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val texts = rows.map(r => Option(r.getString(textIdx)).getOrElse(""))
        val embeddable = texts.zipWithIndex.filter(_._1.nonEmpty)
        val vecs = if (embeddable.isEmpty) Seq.empty
          else batcher(embeddable.map(_._1))
        require(vecs.length == embeddable.length,
          s"batcher returned ${vecs.length} vectors for ${embeddable.length} texts")
        val byIdx = embeddable.map(_._2).zip(vecs).toMap
        rows.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ byIdx.get(i).map(_.toSeq).orNull)
        }
      }
    }
  }
}
