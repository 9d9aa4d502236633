package graft.operators

import org.apache.spark.sql.functions._
import sys.process._

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}

/** Independent cross-validation of the two non-SQL-expressible chunker
  * strategies (the standing oracle exemptions t_chunk_recursive /
  * t_chunk_markdown): scripts/chunker_check.py reimplements the public
  * langchain textsplitter algorithm the reference delegates to
  * (internal/impl/text/text_chunker_processor.go:33-101) in pure
  * python — zero shared code with the engine — and must reproduce the
  * engine's chunk boundaries value-for-value over the sf0.1 corpus.
  * Same pattern as iceberg_check.py: a second implementation in a
  * second language standing in where DuckDB SQL cannot.
  */
class ChunkerCrossCheckSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"

  private def crossCheck(strategy: String, size: Int, overlap: Int,
                         chunked: org.apache.spark.sql.DataFrame,
                         maxDocId: Int): Unit = {
    val out = java.nio.file.Files
      .createTempDirectory(s"chunk_xc_$strategy").toString
    chunked.coalesce(1).write.mode("overwrite").parquet(out)
    val cmd = Seq("python3", "scripts/chunker_check.py",
      s"$sfDir/documents.parquet", strategy, size.toString,
      overlap.toString, out, s"--max-doc-id=$maxDocId")
    val buf = new StringBuilder
    val code = cmd ! ProcessLogger(l => { buf.append(l).append('\n'); () })
    assert(code == 0, s"chunker_check.py mismatch:\n$buf")
    assert(buf.toString.contains("\"mismatches\": []"), buf.toString)
  }

  test("recursive_character chunks match the independent python over 1000 sf0.1 docs") {
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 1000)
    crossCheck("recursive_character", 120, 20,
      docs.select(col("doc_id"),
          posexplode(T.chunksRecursive(col("text"), 120, 20)))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "chunk"),
      maxDocId = 1000)
  }

  test("markdown chunks match the independent python over 1000 sf0.1 docs") {
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 1000)
    crossCheck("markdown", 150, 0,
      docs.select(col("doc_id"),
          posexplode(call_function("graft_chunk_markdown",
            col("text"), lit(150), lit(0))))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "chunk"),
      maxDocId = 1000)
  }
}
