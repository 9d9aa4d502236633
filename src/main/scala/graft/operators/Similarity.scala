package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.expressions.{GraftFunctions, IvfCells}

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

  /** Multi-table LSH ANN: corpus and queries hash into `tables`
    * independent random-hyperplane bucket sets (graft_lsh_keys kernel —
    * table keys are disjoint by construction); a pair is a candidate
    * when it collides in ANY table, then candidates get exact cosine
    * scores and a per-query top-k.
    *
    * Scale shape: one equi-join shuffle on the bucket key; per-table
    * bucket count is 2^planes (65k at planes=16) so within-bucket
    * population stays bounded as the corpus grows — raise `planes`
    * with corpus size to hold it. Recall rises with `tables`
    * (1-(1-p^planes)^tables S-curve).
    *
    * REGIME: hyperplane LSH collides at rate (1 - θ/π)^planes, so it is
    * a NEAR-DUPLICATE detector — recall is high only for cosine ≳ 0.85
    * at these parameters (the gate test plants near-identical vectors
    * and asserts ≥ 0.9 recall on them). For moderate-similarity top-k
    * (the typical embedding-neighbor regime, cosine 0.2–0.6) use
    * [[ivfTopK]], whose probe cost is tunable independently of the
    * similarity level.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 16, tables: Int = 4): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    def bucketed(df: DataFrame) = df.select(col("vec_id"),
      explode(call_function("graft_lsh_keys",
        col("embedding"), lit(planes), lit(tables))).as("bucket"))
    val cand = bucketed(corpus).as("c")
      .join(bucketed(queries).as("q"),
        col("c.bucket") === col("q.bucket") &&
          col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .distinct()
    val scored = cand
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb")), "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosineFast(col("q_emb"), col("c_emb")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** IVF (inverted-file) ANN top-k — the scale path for
    * moderate-similarity neighbor search where hyperplane LSH recall
    * collapses (see [[lshTopK]]).
    *
    * Fit: a spherical k-means coarse quantizer trained DRIVER-SIDE on
    * a bounded sample (collect ≤ maxTrainRows vectors, Lloyd with
    * normalized-dot assignment) — the standard IVF practice: quantizer
    * training is a sample-sized local computation even when the corpus
    * is 100 TB, and it removes the per-iteration distributed-job
    * overhead a full MLlib fit pays. Search: every corpus vector is
    * assigned to
    * its single nearest cell, each query probes its `nprobe` nearest
    * cells (graft_ivf_cells kernel — centroids ride into generated code
    * as one broadcast reference object), and only the probed cells'
    * members get exact cosine scores.
    *
    * Scale shape: one equi-join shuffle keyed by cell id; per-query work
    * is nprobe/nCells of the corpus, independent of the similarity
    * level. Size `nCells ≈ sqrt(corpusRows)` so cells stay
    * executor-sized; recall rises with `nprobe` (gate test asserts
    * ≥ 0.9 vs [[bruteForceTopK]] at the defaults).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 64, nprobe: Int = 8,
              trainSample: Double = 1.0, fitIter: Int = 20,
              maxTrainRows: Int = 200000): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val train0 = corpus.select(col("embedding"))
    val train =
      if (trainSample < 1.0) train0.sample(trainSample, 42L) else train0
    val sample: Array[Array[Float]] = train.limit(maxTrainRows).collect()
      .map(_.getSeq[Float](0).toArray)
    val centroids = trainSphericalKMeans(sample, nCells, fitIter, seed = 42L)
    def cells(e: Column, n: Int): Column =
      GraftColumnBridge.column(
        IvfCells(GraftColumnBridge.expression(e), centroids, n))
    val cb = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      element_at(cells(col("embedding"), 1), 1).as("cell"))
    val qb = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(cells(col("embedding"), nprobe)).as("cell"))
    val scored = cb.join(broadcast(qb),
        cb("cell") === qb("cell") && col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineFast(col("q_emb"), col("c_emb")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Spherical k-means (Lloyd) on a driver-resident sample: vectors and
    * centroids are L2-normalized, assignment maximizes the dot product
    * (= cosine), the new centroid is the normalized member mean, and an
    * emptied cell keeps its previous centroid. Seeded shuffle init —
    * deterministic for the oracle gates.
    */
  private[operators] def trainSphericalKMeans(
      sample: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    require(sample.nonEmpty, "ivf: empty training sample")
    val dim = sample(0).length
    def normalized(v: Array[Float]): Array[Float] = {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0) v.clone()
      else { val o = new Array[Float](v.length)
        i = 0; while (i < v.length) { o(i) = (v(i) / n).toFloat; i += 1 }; o }
    }
    val vecs = sample.map(normalized)
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, vecs.length)
    var cents: Array[Array[Float]] =
      rnd.shuffle(vecs.indices.toVector).take(kk).map(vecs(_).clone).toArray
    def nearest(v: Array[Float]): Int = {
      var best = 0; var bestDot = Double.MinValue
      var c = 0
      while (c < cents.length) {
        var dot = 0.0; var i = 0
        val cent = cents(c)
        while (i < dim) { dot += v(i).toDouble * cent(i); i += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      best
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      vecs.foreach { v =>
        val c = nearest(v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else normalized(sums(c).map(_.toFloat))
      }
      it += 1
    }
    cents
  }
}
