package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the custom Catalyst expressions. Called from
  * both interpreted `eval` and generated Java (Scala objects emit static
  * forwarders, so `HashOps.dotF(...)` is directly referenceable from
  * codegen'd code).
  *
  * Hash parity: these produce EXACTLY the same values as the built-in
  * `xxhash64` expression (seed 42, string → hashUTF8String, int chained
  * via hashInt), so plans can mix the HOF formulations in
  * [[graft.functions.TextFunctions]] with these kernels and stay
  * result-identical.
  */
object HashOps {
  final val Seed = 42L

  /** Sequential-fold dot product of two float arrays in double
    * precision — same accumulation order as the zip_with/aggregate HOF
    * formulation, so results are bit-identical.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0d
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** MinHash signature: slot j = min over shingles of
    * xxhash64(shingle, j). Matches TextFunctions.minhashSignature
    * (xxhash64(s, slot) == hashInt(slot, hashUTF8String(s, 42))).
    * Empty input → Long.MaxValue sentinels.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h0 = XXH64.hashUTF8String(
        shingles.get(i, org.apache.spark.sql.types.StringType)
          .asInstanceOf[UTF8String], Seed)
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, h0)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct word-n-gram shingle hashes of a token array: each shingle
    * is the space-joined n-token window, hashed exactly like the builtin
    * `xxhash64(concat_ws(' ', …))` (hashUTF8String, seed 42) — so these
    * values are interchangeable with string-shingle pipelines hashed via
    * `xxhash64`. First-occurrence order, duplicates removed.
    *
    * This kernel exists because the HOF formulation
    * (transform + element_at over a tokens attribute) is destroyed by
    * predicate pushdown: a filter referencing the shingle column gets the
    * WHOLE tokenizer re-inlined into every element_at lambda —
    * O(tokens²) per document. One opaque codegen'd call keeps the work
    * O(tokens) no matter how many times Catalyst duplicates the tree.
    */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - n + 1)
    val sep = UTF8String.fromString(" ")
    var cnt = 0
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = toks.get(i + j, org.apache.spark.sql.types.StringType)
          .asInstanceOf[UTF8String]
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), Seed)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** MinHash signature from PRE-HASHED shingles (the output of
    * [[shingleHashes]]): slot j = min over shingles of hashInt(j, h0).
    * Bit-identical to [[minhashSig]] on the corresponding strings because
    * h0 there is the same hashUTF8String value.
    */
  def minhashSigFromHashes(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h0 = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, h0)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Multi-table random-hyperplane LSH buckets for cosine similarity:
    * one bucket key per table; table t uses `planes` hyperplanes whose
    * component for dimension i of plane j is a deterministic
    * pseudo-random unit value derived from xxhash64(i, t*planes + j) —
    * no stored model, reproducible on any cluster. Key layout:
    * (t << planes) | signBits, so keys never collide across tables.
    *
    * Codegen'd kernel because the HOF formulation does
    * planes×tables×dims interpreted hash+multiply ops per row.
    */
  def cosineLshKeys(v: ArrayData, planes: Int, tables: Int): ArrayData = {
    val dims = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var j = 0
      while (j < planes) {
        val planeIdx = t * planes + j
        var proj = 0d
        var i = 0
        while (i < dims) {
          val h = XXH64.hashInt(planeIdx, XXH64.hashInt(i, Seed))
          proj += v.getFloat(i).toDouble * (h.toDouble / Long.MaxValue.toDouble)
          i += 1
        }
        if (proj >= 0) bits |= (1L << j)
        j += 1
      }
      out(t) = (t.toLong << planes) | bits
      t += 1
    }
    new GenericArrayData(out)
  }

  /** `n` nearest IVF cells (by cosine) of a vector against a broadcast
    * centroid table — the coarse-quantizer probe step of IVF ANN search.
    * Returns cell ids ordered by decreasing similarity.
    */
  def nearestCells(v: ArrayData, centroids: Array[Array[Float]], n: Int): ArrayData = {
    val dims = v.numElements()
    val vec = new Array[Double](dims)
    var i = 0
    var vn = 0d
    while (i < dims) { vec(i) = v.getFloat(i).toDouble; vn += vec(i) * vec(i); i += 1 }
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0d
      var cn = 0d
      var j = 0
      val m = math.min(dims, cent.length)
      while (j < m) {
        dot += vec(j) * cent(j); cn += cent(j).toDouble * cent(j).toDouble; j += 1
      }
      sims(c) = if (vn == 0 || cn == 0) 0d else dot / math.sqrt(vn * cn)
      c += 1
    }
    val top = sims.zipWithIndex.sortBy { case (s, idx) => (-s, idx) }
      .take(math.min(n, centroids.length)).map(_._2.toLong)
    new GenericArrayData(top)
  }

  /** 64-bit SimHash over a token array; token hash = built-in
    * xxhash64(token) (hashUTF8String, seed 42) — matches
    * TextFunctions.simhashVotes/simhashFromVotes bit-for-bit.
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(
        tokens.get(i, org.apache.spark.sql.types.StringType)
          .asInstanceOf[UTF8String], Seed)
      var b = 0
      while (b < 64) {
        votes(b) += (if ((h & (1L << b)) != 0) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
