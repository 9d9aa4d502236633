package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** AI processor family (SURVEY.md §2.11; reference openai_chat_completion
  * .adoc:26, cohere_rerank — the `*_chat_completion` / `*_rerank`
  * processors): model calls are batched per partition behind pluggable
  * clients, exactly like [[Embeddings]]; reranking additionally ships a
  * REAL lexical scorer usable without any model.
  */
object Ai {

  /** One chat round-trip: N prompts in, N completions out. */
  type ChatClient = Seq[String] => Seq[String]

  /** Deterministic offline stand-in for a chat endpoint (NOT a model):
    * echoes a canonical digest of the prompt. Exists so pipeline
    * plumbing is testable without model access; production supplies an
    * HTTP-backed client with the same signature.
    */
  def echoClient: ChatClient = prompts =>
    prompts.map(p => s"echo:${java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(p).toLong & 0xffffffffL)}")

  /** chat completion over a prompt column, batched per partition
    * (openai_chat_completion.adoc:26). Same scale shape as
    * [[Embeddings.embedBatched]]: no shuffle, concurrency = partitions.
    */
  def chatCompletion(df: DataFrame, promptCol: String, outCol: String,
                     batchSize: Int, client: ChatClient): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val idx = df.schema.fieldIndex(promptCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val outs = client(rows.map(r => Option(r.getString(idx)).getOrElse("")))
        require(outs.length == rows.length, "client must return one output per prompt")
        rows.zip(outs).map { case (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }
  }

  /** Lexical rerank score — token-overlap ratio (|q ∩ d| / |q|), a real
    * scorer (not a stub): the BM25-free baseline rerankers fall back
    * to. Pure codegen-friendly Column expression.
    */
  def lexicalScore(query: Column, doc: Column): Column = {
    val q = array_distinct(TextFunctions.tokens(lower(query)))
    val d = array_distinct(TextFunctions.tokens(lower(doc)))
    when(size(q) > 0,
      size(array_intersect(q, d)).cast("double") / size(q).cast("double"))
      .otherwise(lit(0.0))
  }

  /** rerank: per query, order candidate docs by score and keep top-k —
    * one window pass, no shuffle beyond the per-query partition.
    * `tieBreak` makes the cut deterministic when scores AND texts
    * collide (duplicate documents — routine in replicated corpora);
    * pass the document id.
    */
  def rerank(pairs: DataFrame, queryIdCol: String, queryCol: String,
             docCol: String, k: Int,
             tieBreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol))
      .orderBy(col("score").desc +: col(docCol) +: tieBreak: _*)
    pairs.withColumn("score", round(lexicalScore(col(queryCol), col(docCol)), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
