package graft.sources

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkSpec

/** File-source scanners (reference docs/modules/components/pages/
  * scanners pages): decompress + lines / to_the_end / chunker /
  * re_match composition, and skip_bom.
  */
class ScannerSpec extends SparkSpec {
  import spark.implicits._

  private def gzFile(dir: java.io.File, name: String, content: String): Unit = {
    val out = new GZIPOutputStream(new FileOutputStream(new java.io.File(dir, name)))
    out.write(content.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  private def tmpDir(): java.io.File = {
    val d = Files.createTempDirectory("scanner").toFile
    d.deleteOnExit()
    d
  }

  test("decompress + lines explodes gzip files, dropping only the trailing artifact") {
    val dir = tmpDir()
    gzFile(dir, "a.gz", "one\n\nthree\n") // mid-body empty line is a message
    val rows = Sources.decompressFiles(spark, dir.getPath + "/*.gz", "gzip")
      .select("value").as[String].collect().toSeq
    assert(rows == Seq("one", "", "three"))
  }

  test("decompress + to_the_end yields one message per file") {
    val dir = tmpDir()
    gzFile(dir, "a.gz", "whole body\nwith newline")
    val rows = Sources.decompressFiles(spark, dir.getPath + "/*.gz", "gzip",
        scanner = "to_the_end")
      .select("value").as[String].collect().toSeq
    assert(rows == Seq("whole body\nwith newline"))
  }

  test("re_match scanner splits at match starts, keeping the match text") {
    val dir = tmpDir()
    gzFile(dir, "a.gz",
      "10:00:01 first line\ncont\n10:00:02 second\n10:00:03 third")
    val rows = Sources.decompressFiles(spark, dir.getPath + "/*.gz", "gzip",
        scanner = "re_match", pattern = "(?m)^\\d\\d:\\d\\d:\\d\\d")
      .select("value").as[String].collect().toSeq
    assert(rows == Seq("10:00:01 first line\ncont\n",
      "10:00:02 second\n", "10:00:03 third"))
  }

  test("re_match keeps a non-matching prelude as its own message") {
    val dir = tmpDir()
    gzFile(dir, "a.gz", "prelude 10:00:01 a 10:00:02 b")
    val rows = Sources.decompressFiles(spark, dir.getPath + "/*.gz", "gzip",
        scanner = "re_match", pattern = "\\d\\d:\\d\\d:\\d\\d")
      .select("value").as[String].collect().toSeq
    assert(rows == Seq("prelude ", "10:00:01 a ", "10:00:02 b"))
  }

  test("chunker scanner emits fixed-size chunks that reconstruct the body") {
    val dir = tmpDir()
    val body = ("abcdefghij" * 10) // 100 chars
    gzFile(dir, "a.gz", body)
    val rows = Sources.decompressFiles(spark, dir.getPath + "/*.gz", "gzip",
        scanner = "chunker", chunkSize = 32)
      .select("value").as[String].collect().toSeq
    assert(rows.forall(_.length <= 32))
    assert(rows.mkString == body)
  }

  test("skip_bom strips a UTF-8 BOM only at the start") {
    val dir = tmpDir()
    gzFile(dir, "a.gz", "﻿first\nsecond﻿kept")
    val rows = Sources.decompressFiles(spark, dir.getPath + "/*.gz", "gzip")
      .select("value").as[String].collect().toSeq
    assert(rows == Seq("first", "second﻿kept"))
  }

  private def txtFile(dir: java.io.File, name: String, content: String): Unit = {
    Files.write(new java.io.File(dir, name).toPath,
      content.getBytes(StandardCharsets.UTF_8))
    ()
  }

  test("switch scanner: first matching candidate wins, catch-all covers the rest") {
    val dir = tmpDir()
    txtFile(dir, "a.jsonl", "l1\nl2\n")        // → lines (2 messages)
    txtFile(dir, "b.log", "E1 x E2 y")         // → re_match on E\d (2 messages)
    gzFile(dir, "c.gz", "zipped body")          // → decompress+to_the_end
    txtFile(dir, "d.bin", "whole")              // → catch-all to_the_end
    val out = Sources.switchFiles(spark, dir.getPath + "/*", Seq(
      Sources.ScanCase(Some("\\.jsonl$")),
      Sources.ScanCase(Some("\\.log$"), scanner = "re_match", pattern = "E\\d"),
      Sources.ScanCase(Some("\\.gz$"), scanner = "to_the_end", algo = "gzip"),
      Sources.ScanCase(None, scanner = "to_the_end")))
    val rows = out.select("value", "error").as[(String, String)]
      .collect().toSeq.sortBy(r => Option(r._1).getOrElse(""))
    assert(rows.forall(_._2 == null), "catch-all: nothing rejected")
    assert(rows.map(_._1) == Seq("E1 x ", "E2 y", "l1", "l2", "whole", "zipped body"))
  }

  test("switch scanner: a file matching no candidate is rejected with an error") {
    val dir = tmpDir()
    txtFile(dir, "a.jsonl", "ok\n")
    txtFile(dir, "mystery.dat", "data")
    val out = Sources.switchFiles(spark, dir.getPath + "/*",
      Seq(Sources.ScanCase(Some("\\.jsonl$")))) // no catch-all
    val good = out.filter("error IS NULL").select("value")
      .as[String].collect().toSeq
    assert(good == Seq("ok"))
    val bad = out.filter("error IS NOT NULL").select("value", "error")
      .as[(String, String)].collect().toSeq
    assert(bad.size == 1 && bad.head._1 == null &&
      bad.head._2.contains("mystery.dat"))
  }

  test("switch scanner: candidates after a catch-all are unreachable") {
    val dir = tmpDir()
    txtFile(dir, "a.jsonl", "x\ny\n")
    val out = Sources.switchFiles(spark, dir.getPath + "/*", Seq(
      Sources.ScanCase(None, scanner = "to_the_end"), // catch-all first
      Sources.ScanCase(Some("\\.jsonl$"))))
    val rows = out.select("value").as[String].collect().toSeq
    assert(rows == Seq("x\ny\n"), "catch-all claimed the file whole")
  }
}
