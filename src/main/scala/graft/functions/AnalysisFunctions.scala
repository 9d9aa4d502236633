package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document quality scoring and language identification — the scoring
  * heuristics a training-data curation pipeline runs over every document.
  * Pure built-in expressions (codegen'd, no UDF) and deliberately simple
  * enough to restate in ANSI SQL for the DuckDB oracle.
  */
object AnalysisFunctions {
  import TextFunctions.tokens

  /** Ratio of alphabetic characters to total characters (0 for empty). */
  def alphaRatio(text: Column): Column = {
    val len = length(text).cast("double")
    when(len === 0, lit(0d))
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")) / len)
  }

  /** Ratio of whitespace characters. */
  def spaceRatio(text: Column): Column = {
    val len = length(text).cast("double")
    when(len === 0, lit(0d))
      .otherwise(length(regexp_replace(text, "[^ \\t\\n]", "")) / len)
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0d))
      .otherwise(aggregate(ts, lit(0L), (a, t) => a + length(t))
        .cast("double") / size(ts))
  }

  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Fraction of tokens that are common English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0d))
      .otherwise(size(filter(ts, t => lower(t).isin(enStops.map(lit): _*)))
        .cast("double") / size(ts))
  }

  /** Composite quality score in [0,1], rounded to 4 decimals so the value
    * is bit-stable across engines. The 1e-9 nudge before rounding settles
    * exact 4-decimal HALFWAY cases (the weights make e.g. 0.61035
    * reachable exactly): Spark rounds the double's shortest decimal
    * representation HALF_UP while binary-double engines round the binary
    * value, and the two disagree precisely on those boundaries. The
    * component rationals' spacing is far coarser than 1e-9, so the nudge
    * can only flip ties, never a genuinely distinct value.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500d, lit(1d))
    round(lit(0.35) * alphaRatio(text)
        + lit(0.25) * least(stopwordRatio(text) * 4d, lit(1d))
        + lit(0.20) * lenScore
        + lit(0.20) * least(spaceRatio(text) * 5d, lit(1d)) + lit(1e-9), 4)
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "und", "die", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "es", "y", "una"))

  private def markerHits(text: Column, words: Seq[String]): Column = {
    val ts = tokens(text)
    size(filter(ts, t => lower(t).isin(words.map(lit): _*)))
  }

  /** N-gram/stopword-marker language ID heuristic: the language whose
    * marker words hit most tokens wins; ties break in declaration order;
    * zero hits => "unknown". Replicable 1:1 in SQL.
    */
  def langId(text: Column): Column = {
    val hits = markers.map { case (lang, ws) => lang -> markerHits(text, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("unknown"): Column) { case ((lang, h), els) =>
      when(h === best && best > 0, lit(lang)).otherwise(els)
    }
  }
}
