package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}

/** Scale-adaptive kernel parallelism for unsplittable inputs (guide
  * §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * A single-row-group parquet file yields ONE scan task no matter what
  * `maxPartitionBytes` says (the row group is the atomic split), so an
  * expensive per-row kernel above it runs serially. [[spread]]
  * redistributes to `defaultParallelism` partitions ONLY when the
  * scan's parallelism is below it — on any real-scale corpus (many
  * files / row groups) it adds NOTHING: no exchange, identical plan.
  *
  * Shared by the dedup miners (r19) and the per-row CPU kernels in
  * SparkEntry (geoip-mmdb trie walk, JS/wasm/ffi guest runtimes, ILP
  * codec) — previously those repartitioned unconditionally, which on a
  * multi-split input would force a needless full exchange and CAP scan
  * parallelism at defaultParallelism (VERDICT r19 #2).
  */
object Spread {

  /** True iff the plan is pure scan-side lineage — project/filter over
    * leaf relations only. Probing `.rdd.getNumPartitions` on such a
    * plan only PLANS (no exchange upstream means no query stage can
    * execute); on anything with an exchange/aggregate/join upstream
    * the probe would eagerly execute those stages under AQE, paying
    * the query once extra just to read a partition count (ADVICE r19:
    * the old call-site-comment discipline is now enforced here).
    */
  private[operators] def scanSide(plan: LogicalPlan): Boolean = plan match {
    case p: Project       => scanSide(p.child)
    case f: Filter        => scanSide(f.child)
    case s: SubqueryAlias => scanSide(s.child)
    case _: LeafNode      => true
    case _                => false
  }

  /** Repartition `df` to `defaultParallelism` iff its scan-side plan
    * currently has fewer partitions; identity otherwise. With `keys`,
    * distribution is a deterministic hash of those columns (pass a
    * UNIQUE key — a skewed key just moves the serialization); without,
    * round-robin (pays the deterministic local sort-before-repartition,
    * fine for frames with no narrow unique column). Safe only where
    * downstream output is partition-invariant (joins / aggregations /
    * a final orderBy), which holds at every call site.
    */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    if (!scanSide(df.queryExecution.analyzed)) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= p) df
      else if (keys.nonEmpty) df.repartition(p, keys: _*)
      else df.repartition(p)
    }
  }
}
