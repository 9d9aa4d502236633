package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.expressions.GraftFunctions

/** Approximate-nearest-neighbor / similarity search over an
  * `array<float>` embedding column.
  *
  * Feeds the reference's vector sinks (qdrant/pinecone outputs,
  * docs/modules/components/pages/outputs/qdrant.adoc:26) and the AI
  * embedding processors (§2.11 of SURVEY.md) with a Spark-native search
  * path.
  */
object Similarity {

  /** Brute-force cosine top-k: every query vector against the full
    * corpus. The query set is broadcast (it is small by construction), so
    * the corpus is scanned exactly once with no shuffle before the final
    * top-k; ranking is one shuffle of (corpusRows × queries) scored rows,
    * pre-pruned per partition because row_number is preceded by a
    * partial sort within partitions under AQE.
    *
    * For a 100 TB corpus this is the exact-baseline; use [[lshTopK]]
    * when query volume grows.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val scored = corpus.as("c")
      .join(broadcast(queries.as("q")),
        col("c.vec_id") =!= col("q.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(cosineFast(col("q.embedding"), col("c.embedding")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** LSH-bucketed ANN: corpus and queries are hashed into random-
    * hyperplane buckets; each query only scores vectors in its bucket.
    * One equi-join shuffle on the bucket key instead of a full scan per
    * query — the scale path when both sides are large. Recall is
    * probabilistic; increase `planes` for precision, add multi-probe or
    * repeated tables for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cb = corpus.withColumn("bucket", cosineLshKey(col("embedding"), planes))
    val qb = queries.withColumn("bucket", cosineLshKey(col("embedding"), planes))
    val scored = cb.as("c").join(qb.as("q"),
        col("c.bucket") === col("q.bucket") &&
          col("c.vec_id") =!= col("q.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(cosineFast(col("q.embedding"), col("c.embedding")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
