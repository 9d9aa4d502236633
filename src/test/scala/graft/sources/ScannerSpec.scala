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
}
