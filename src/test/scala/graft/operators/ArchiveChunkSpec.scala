package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions
import graft.functions.expressions.{ArchiveOps, GraftFunctions}

/** tar/zip archive round-trips and recursive-character chunker
  * invariants (reference archive.adoc:26 formats; text_chunker
  * strategy recursive_character).
  */
class ArchiveChunkSpec extends SparkSpec {

  test("tar round-trip preserves entries and is deterministic") {
    val names = Array("a.txt", "dir/b.bin")
    val bodies = Array("hello".getBytes("UTF-8"), Array[Byte](0, 1, 2, 127))
    val tarred = ArchiveOps.tar(names, bodies)
    val (n2, b2) = ArchiveOps.untar(tarred)
    assert(n2.toSeq == names.toSeq)
    assert(b2.map(_.toSeq).toSeq == bodies.map(_.toSeq).toSeq)
    assert(tarred.toSeq == ArchiveOps.tar(names, bodies).toSeq,
      "tar output must be byte-identical across runs")
  }

  test("zip round-trip preserves entries") {
    val names = Array("x", "y")
    val bodies = Array("one".getBytes("UTF-8"), "two".getBytes("UTF-8"))
    val (n2, b2) = ArchiveOps.unzip(ArchiveOps.zip(names, bodies))
    assert(n2.toSeq == names.toSeq)
    assert(b2.map(new String(_, "UTF-8")).toSeq == Seq("one", "two"))
  }

  test("tar/zip as column expressions over grouped rows") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("g1", "a", "alpha"), ("g1", "b", "beta"), ("g2", "c", "gamma"))
      .toDF("g", "name", "body")
      .groupBy("g")
      .agg(sort_array(collect_list(col("name"))).as("names"),
        sort_array(collect_list(col("body"))).as("bodies"))
      .select(col("g"), call_function("graft_tar", col("names"),
        transform(col("bodies"), b => b.cast("binary"))).as("archive"))
      .select(col("g"),
        explode(call_function("graft_untar", col("archive"))).as("e"))
      .select(col("g"), col("e.name"), col("e.body").cast("string").as("body"))
      .orderBy("g", "name")
    assert(df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("g1", "a", "alpha"), ("g1", "b", "beta"), ("g2", "c", "gamma")))
  }

  test("recursive chunker: word-boundary merge with overlap") {
    val chunks = ArchiveOps.chunkRecursive("aa bb cc dd",
      Array("\n\n", "\n", " ", ""), 5, 2)
    assert(chunks.toSeq == Seq("aa bb", "bb cc", "cc dd"))
  }

  test("recursive chunker: paragraph boundary preferred, size bound holds") {
    val text = "para one words here\n\npara two more words"
    val chunks = ArchiveOps.chunkRecursive(text,
      Array("\n\n", "\n", " ", ""), 20, 0)
    assert(chunks.forall(c => c.codePointCount(0, c.length) <= 20))
    assert(chunks.contains("para one words here"))
    assert(chunks.contains("para two more words"))
  }

  test("recursive chunker over documents: bounds + no word loss") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val rows = docs.select(col("doc_id"), col("text"),
        TextFunctions.chunksRecursive(col("text"), 120, 20).as("chunks"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(1)
      val chunks = r.getSeq[String](2)
      chunks.foreach(c =>
        assert(c.codePointCount(0, c.length) <= 120, s"chunk over size: '$c'"))
      val wordsIn = text.split("\\s+").filter(_.nonEmpty).toSet
      val wordsOut = chunks.flatMap(_.split("\\s+")).filter(_.nonEmpty).toSet
      assert(wordsIn.subsetOf(wordsOut),
        s"doc ${r.getLong(0)} lost words: ${(wordsIn -- wordsOut).take(5)}")
    }
  }

  test("token chunker: every chunk <= chunk_size tokens, overlap honored") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val rows = docs.select(col("doc_id"), col("text"),
        TextFunctions.chunksToken(col("text"), 32, 8).as("chunks"))
      .collect()
    val tokRe = TextFunctions.BpeTokenRe.r
    def toks(s: String): Seq[String] = tokRe.findAllIn(s).toSeq
    rows.filter(!_.isNullAt(1)).foreach { r =>
      val chunks = r.getSeq[String](2)
      chunks.foreach(c =>
        assert(toks(c).length <= 32, s"chunk over 32 tokens: '$c'"))
      // consecutive chunks share exactly the 8-token overlap (except a
      // short tail): chunk k starts 24 tokens after chunk k-1
      chunks.sliding(2).foreach {
        case Seq(a, b) if toks(a).length == 32 =>
          assert(toks(a).drop(24) == toks(b).take(toks(a).length - 24),
            s"overlap mismatch between '$a' and '$b'")
        case _ => ()
      }
    }
  }

  test("token chunker with zero overlap reconstructs the text") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val rows = docs.select(col("text"),
        TextFunctions.chunksToken(col("text"), 16, 0).as("chunks"))
      .collect()
    rows.filter(!_.isNullAt(0)).foreach { r =>
      assert(r.getSeq[String](1).mkString == r.getString(0),
        "overlap-0 token chunks must concatenate back to the text")
    }
  }

  test("config-runner text_chunker strategy token explodes chunks") {
    val yaml =
      """input:
        |  generate:
        |    count: 3
        |    mapping: 'root.id = this.seq'
        |pipeline:
        |  processors:
        |    - mapping: 'root = "some words here repeated again and again for chunking"'
        |    - text_chunker:
        |        strategy: token
        |        chunk_size: 4
        |        chunk_overlap: 0
        |""".stripMargin
    import spark.implicits._
    val out = graft.config.Pipeline.build(spark, yaml)
      .select($"value").as[String].collect()
    assert(out.length > 3, "chunking must multiply rows")
    assert(out.forall(TextFunctions.BpeTokenRe.r.findAllIn(_).size <= 4))
  }

  test("markdown chunker splits at heading boundaries") {
    val text = "# Title\nintro words\n\n## Section A\nbody a\n## Section B\nbody b"
    val chunks = ArchiveOps.chunkMarkdown(text, 100, 0)
    assert(chunks.toSeq == Seq(
      "# Title\nintro words",
      "## Section A\nbody a",
      "## Section B\nbody b"))
  }

  test("markdown chunker recursively splits oversized sections") {
    val big = "# H\n" + ("word " * 50).trim
    val chunks = ArchiveOps.chunkMarkdown(big, 40, 0)
    assert(chunks.length > 1)
    assert(chunks.forall(c => c.codePointCount(0, c.length) <= 40))
  }

  test("archiveFiles source: tar files on disk explode into entries") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tar").toFile
    java.nio.file.Files.write(new java.io.File(dir, "one.tar").toPath,
      ArchiveOps.tar(Array("a.txt", "b.txt"),
        Array("alpha".getBytes("UTF-8"), "beta".getBytes("UTF-8"))))
    java.nio.file.Files.write(new java.io.File(dir, "two.tar").toPath,
      ArchiveOps.tar(Array("c.txt"), Array("gamma".getBytes("UTF-8"))))
    val rows = graft.sources.Sources.archiveFiles(spark, dir.getPath + "/*.tar")
      .select(col("name"), col("body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq(("a.txt", "alpha"), ("b.txt", "beta"), ("c.txt", "gamma")))
  }
}
