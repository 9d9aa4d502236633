package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for document corpora, designed for the
  * 100 TB path: every variant is a pure DataFrame plan (scan → narrow
  * per-row hashing → one shuffle on the dedup key), no driver-side state.
  *
  * Reference semantics: the `dedupe` processor drops messages whose key
  * was already seen (docs/modules/components/pages/processors/dedupe.adoc:26,
  * config/test/deduplicate.yaml:1-37); here generalized to corpus-level
  * exact and near-duplicate detection.
  */
object Dedupe {

  /** Exact dedup on a canonical text fingerprint: keeps the row with the
    * lowest `idCol` per fingerprint. One shuffle on the md5 key; the key
    * is high-cardinality and uniform, so no skew at scale.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.withColumn("fp", fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  private def shingleSets(docs: DataFrame, textCol: String,
                          idCol: String, shingleN: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))

  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(sets.select(col("id"), col("sh").as("sh_a")), col("id_a") === col("id"))
      .drop("id")
      .join(sets.select(col("id"), col("sh").as("sh_b")), col("id_b") === col("id"))
      .drop("id")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** All near-duplicate pairs (idA < idB) with word-`shingleN`-gram
    * Jaccard >= threshold — EXACT result. Candidate generation is an
    * inverted-index self-join on shingles (any qualifying pair must share
    * at least one shingle), so the expensive Jaccard runs only on pairs
    * that share content, never on the full cross product.
    *
    * Scale notes: the shuffle key is the shingle string; ubiquitous
    * shingles create skew — raise shingleN, or pre-filter shingles by
    * document frequency (trades exactness) when the corpus demands it.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleN: Int, threshold: Double): DataFrame = {
    val sets = shingleSets(docs, textCol, idCol, shingleN)
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    val cand = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, sets, threshold)
  }

  /** MinHash + LSH near-dup pairs: signatures of k = bands*rowsPerBand
    * minhashes; docs sharing any band bucket become candidates, verified
    * with exact shingle Jaccard. Probabilistic recall (standard S-curve),
    * exact precision thanks to the verify step. One shuffle on the band
    * key — this is the 100 TB path: candidate volume tracks true-duplicate
    * density, not corpus size squared.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
                      shingleN: Int, bands: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val k = bands * rowsPerBand
    val sets = shingleSets(docs, textCol, idCol, shingleN)
    val withSig = sets.withColumn("sig",
      when(size(col("sh")) === 0, array_repeat(lit(Long.MaxValue), k))
        .otherwise(transform(sequence(lit(0), lit(k - 1)),
          slot => array_min(transform(col("sh"), s => xxhash64(s, slot))))))
    val banded = withSig.select(col("id"),
      explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(cand, sets, threshold)
  }

  /** SimHash near-dup pairs: 64-bit fingerprints; candidates share one of
    * four 16-bit sub-blocks (Charikar/Manku block-permuted scheme — any
    * pair within Hamming distance 3 must agree on a full block), then
    * verified by Hamming distance <= maxHamming.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int): DataFrame = {
    val fp = docs
      .select(col(idCol).as("id"), simhashVotes(col(textCol)).as("votes"))
      .select(col("id"), simhashFromVotes(col("votes")).as("sh"))
    val blocks = fp.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        concat_ws(":", b.cast("string"),
          call_function("shiftright", col("sh"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).cast("string")))).as("blk"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
