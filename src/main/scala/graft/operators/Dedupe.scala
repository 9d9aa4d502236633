package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.expressions.GraftFunctions

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
    // two-step projection: tokens materialize as a column so the shingle
    // lambda reads them via element_at instead of re-tokenizing per index
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"),
        array_distinct(shinglesFromTokens(col("toks"), shingleN)).as("sh"))

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
    // Shingle sets are distinct per doc, so the number of co-occurring
    // (id_a, id_b) rows after the inverted-index self-join IS the
    // intersection size — Jaccard falls straight out of one groupBy,
    // with no distinct() pass and no re-join against the shingle sets.
    val sets = shingleSets(docs, textCol, idCol, shingleN)
    // Shingles are joined by their 64-bit hash, not the string: the
    // shuffle moves 8-byte keys instead of n-gram text (collisions are
    // ~|shingles|²/2⁶⁴ — vanishing, and only ever inflate one count).
    // `sz` must be projected BEFORE the explode: computed alongside it,
    // Catalyst moves size(sh) after the Generate and then carries (and
    // unsafe-copies) the whole shingle array on every exploded row.
    val inv = sets.withColumn("sz", size(col("sh")))
      .select(col("id"), col("sz"), explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("s"))
    val inter = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
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
    GraftFunctions.register(docs.sparkSession)
    val sets = shingleSets(docs, textCol, idCol, shingleN)
    val withSig = sets.withColumn("sig",
      call_function("graft_minhash", col("sh"), lit(k)))
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
    GraftFunctions.register(docs.sparkSession)
    val fp = docs.select(col(idCol).as("id"),
      call_function("graft_simhash", tokens(col(textCol))).as("sh"))
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
