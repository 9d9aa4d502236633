package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment-join operators (SURVEY.md §2 #34-36): the reference's
  * `sequence.sharded_join` input, the cache-hydration join pattern, and
  * the `branch`+lookup enrichment processors, re-expressed as Spark
  * joins so Catalyst plans the exchange (broadcast for dim-sized sides,
  * shuffle otherwise) instead of per-message cache calls.
  */
object Joins {

  /** `sharded_join` (docs/modules/components/pages/inputs/
    * sequence.adoc:94-229): aggregate fields of rows sharing an id
    * across N inputs, then join.
    *
    * Merge strategies (per the documented hobbies example,
    * sequence.adoc:110-118):
    *   - `array`: a non-id field whose values repeat per id ANYWHERE in
    *     its input becomes a sorted array column for every id (the
    *     example's `hobbies`); single-valued fields stay scalar.
    *     Relationally this makes the merged schema CONSISTENT across
    *     rows, unlike a per-row ragged merge.
    *   - `replace`: later rows replace earlier ones per id — here
    *     deterministically the max value (batch order is not defined in
    *     a distributed read).
    *
    * `joinType` full-outer keeps every id seen anywhere; `outer` keeps
    * only ids present in the LAST input (sequence.adoc:213-216).
    *
    * Scale: each input pre-aggregates map-side before one shuffle on the
    * id; the final join is id-partitioned with no further exchange.
    */
  def shardedJoin(inputs: Seq[DataFrame], idCol: String,
                  joinType: String = "full-outer",
                  mergeStrategy: String = "array",
                  arrayFields: Option[Set[String]] = None): DataFrame = {
    require(inputs.nonEmpty, "sharded_join needs at least one input")
    require(Seq("full-outer", "outer").contains(joinType), s"joinType: $joinType")
    require(Seq("array", "replace").contains(mergeStrategy),
      s"mergeStrategy: $mergeStrategy")

    def aggregated(df: DataFrame): DataFrame = {
      val fields = df.columns.filterNot(_ == idCol)
      mergeStrategy match {
        case "replace" =>
          df.groupBy(col(idCol))
            .agg(max(col(fields.head)).as(fields.head),
              fields.tail.map(f => max(col(f)).as(f)).toSeq: _*)
        case "array" =>
          val grouped = df.groupBy(col(idCol))
            .agg(sort_array(collect_list(col(fields.head))).as(fields.head),
              fields.tail.map(f => sort_array(collect_list(col(f))).as(f)).toSeq: _*)
          // which fields stay arrays: caller-specified at scale (skips
          // the inference pass), else inferred — repeated per id
          // anywhere in THIS input → array for every id
          val repeated: Set[String] = arrayFields.getOrElse {
            val maxes = df.groupBy(col(idCol))
              .agg(count(col(fields.head)).as(fields.head),
                fields.tail.map(f => count(col(f)).as(f)).toSeq: _*)
              .select(fields.map(f => max(col(f)).as(f)).toSeq: _*)
              .head()
            fields.zipWithIndex.collect {
              case (f, i) if maxes.getLong(i) > 1 => f
            }.toSet
          }
          grouped.select(col(idCol) +: fields.map { f =>
            if (repeated(f)) col(f) else element_at(col(f), 1).as(f)
          }.toSeq: _*)
      }
    }

    val aggd = inputs.map(aggregated)
    val joined = aggd.reduce((l, r) => l.join(r, Seq(idCol), "full_outer"))
    joinType match {
      case "full-outer" => joined
      case "outer" =>
        joined.join(inputs.last.select(col(idCol)).distinct(), Seq(idCol),
          "left_semi")
    }
  }

  /** Cache-hydration join (config/examples/joining_streams.yaml:82-131):
    * a stream enriched from a keyed cache table that earlier messages
    * populated. In Spark the cache IS a DataFrame (state store or dim
    * table); hydration = broadcast left join + optional fallback for
    * misses. Misses keep the row with nulls (the reference retries via
    * its cache processor; at the plan level that's a filter on the
    * hydrated column).
    */
  def hydrationJoin(stream: DataFrame, cache: DataFrame, key: String,
                    broadcastCache: Boolean = true): DataFrame = {
    val c = if (broadcastCache) broadcast(cache) else cache
    stream.join(c, Seq(key), "left_outer")
  }

  /** Skew-safe equi-join: salt the SKEWED (large, hot-keyed) side with
    * `salts` random buckets and replicate the other side across every
    * bucket, so one hot key spreads over `salts` tasks instead of
    * stalling a single reducer. Use when AQE's skew-join split isn't
    * available (non-shuffle stages) or the skew is known up front;
    * `salts` ≈ executor-core count over hot-key share.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val s = skewed.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(o, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Enrichment lookup in `branch` form (processors/branch.adoc:26 +
    * sql_select.adoc:26): compute request columns, look them up in a
    * lookup table, merge the response columns back — rows without a
    * match pass through unchanged (nulls in response columns).
    */
  def enrichmentLookup(df: DataFrame, lookup: DataFrame,
                       requestKey: Column, lookupKey: String,
                       responseCols: Seq[String]): DataFrame = {
    val resp = lookup.select((lookupKey +: responseCols).map(col): _*)
    df.withColumn("__req", requestKey)
      .join(broadcast(resp), col("__req") === col(lookupKey), "left_outer")
      .drop("__req", lookupKey)
  }

  /** GeoIP-style range lookup (reference geoip_* Bloblang methods,
    * methods.adoc:4492-4557, backed by a MaxMind city/ASN db): enrich
    * each row whose `ipCol` (IPv4 dotted-quad) falls inside a range of
    * the `ranges` dim — (range_start, range_end) dotted-quads plus
    * attribute columns. The db itself isn't shipped here; any CSV/parquet
    * export of it works.
    *
    * Spark shape: ranges are binned by /16 IP prefix — a range spanning
    * several /16 blocks appears once per block — so the probe is a
    * broadcast HASH equi-join on the bin plus a residual BETWEEN
    * filter. A raw BETWEEN join would plan as a broadcast nested-loop:
    * ~3M range comparisons per probe row at real MaxMind size. Rows
    * with no matching range keep nulls — lookups never drop data.
    */
  def ipRangeLookup(df: DataFrame, ranges: DataFrame, ipCol: String,
                    startCol: String = "range_start",
                    endCol: String = "range_end"): DataFrame = {
    def ipNum(c: Column): Column =
      aggregate(transform(split(c, "\\."), p => p.cast("long")),
        lit(0L), (acc, x) => acc * 256 + x)
    val binBits = 16
    val dim = broadcast(ranges
      .withColumn("__lo", ipNum(col(startCol)))
      .withColumn("__hi", ipNum(col(endCol)))
      .drop(startCol, endCol)
      .withColumn("__bin", explode(sequence(
        shiftright(col("__lo"), binBits), shiftright(col("__hi"), binBits)))))
    df.withColumn("__ip", ipNum(col(ipCol)))
      .join(dim,
        shiftright(col("__ip"), binBits) === col("__bin") &&
          col("__ip") >= col("__lo") && col("__ip") <= col("__hi"),
        "left_outer")
      .drop("__ip", "__bin", "__lo", "__hi")
  }
}
