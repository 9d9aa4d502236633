package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed from
  * higher-order built-ins (`zip_with`, `aggregate`) so similarity search
  * stays inside WholeStageCodegen. Accumulation is strictly
  * left-to-right, making results bit-deterministic (same plan => same
  * doubles on every engine that folds sequentially).
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product in double precision (HOF formulation —
    * interpreted; prefer [[dotFast]] in hot paths, same result
    * bit-for-bit).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0d), (s, x) => s + x)

  /** Codegen'd dot product over `array<float>` via the custom Catalyst
    * expression [[graft.functions.expressions.DotProductFloat]]
    * (requires GraftFunctions.register / GraftExtensions). Identical
    * accumulation order to [[dot]] — bit-identical doubles.
    */
  def dotFast(a: Column, b: Column): Column =
    call_function("graft_dot_f", a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm2(a) * norm2(b)
    when(d === 0, lit(0d)).otherwise(dot(a, b) / d)
  }

  /** Codegen'd cosine similarity (see [[dotFast]]). */
  def cosineFast(a: Column, b: Column): Column = {
    val d = sqrt(dotFast(a, a)) * sqrt(dotFast(b, b))
    when(d === 0, lit(0d)).otherwise(dotFast(a, b) / d)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0d), (s, x) => s + x))

  /** Random-hyperplane LSH bucket for cosine similarity: one sign bit per
    * deterministic pseudo-random hyperplane. Hyperplane j's component i is
    * derived from xxhash64(i, j) mapped to [-1, 1) — no stored model, so
    * the same bucketing is reproducible on any cluster at any scale.
    */
  def cosineLshKey(v: Column, planes: Int): Column = {
    val dv = asDouble(v)
    val bits = transform(sequence(lit(0), lit(planes - 1)), j => {
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1),
          (x, i) => x * (xxhash64(i, j).cast("double") / lit(Long.MaxValue.toDouble))),
        lit(0d), (s, x) => s + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(planes - 1)),
        (bit, j) => bit.cast("long") * call_function("shiftleft", lit(1L), j)),
      lit(0L), (s, x) => s + x)
  }
}
