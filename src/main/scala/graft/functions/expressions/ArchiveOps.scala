package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.commons.compress.archivers.zip.{ZipArchiveEntry, ZipArchiveInputStream, ZipArchiveOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for binary archive formats (reference `archive`/`unarchive`
  * processors, docs/modules/components/pages/processors/archive.adoc:26 —
  * formats tar/zip alongside the relational lines/json_array/csv forms
  * in [[graft.operators.BatchOps]]). Entries are (name, body) pairs;
  * commons-compress ships with Spark.
  *
  * Deterministic: entry metadata is zeroed (fixed mod-time, no uid/gid)
  * so the same inputs always produce byte-identical archives — required
  * for the hash-based correctness gates and for reproducible outputs at
  * scale.
  */
object ArchiveOps {

  def tar(names: Array[String], bodies: Array[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new TarArchiveOutputStream(bos)
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    var i = 0
    while (i < names.length) {
      val e = new TarArchiveEntry(names(i))
      e.setSize(bodies(i).length)
      e.setModTime(0L)
      out.putArchiveEntry(e)
      out.write(bodies(i))
      out.closeArchiveEntry()
      i += 1
    }
    out.close()
    bos.toByteArray
  }

  def untar(data: Array[Byte]): (Array[String], Array[Array[Byte]]) = {
    val in = new TarArchiveInputStream(new ByteArrayInputStream(data))
    val names = Array.newBuilder[String]
    val bodies = Array.newBuilder[Array[Byte]]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        names += e.getName
        bodies += in.readAllBytes()
      }
      e = in.getNextEntry
    }
    (names.result(), bodies.result())
  }

  def zip(names: Array[String], bodies: Array[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ZipArchiveOutputStream(bos)
    var i = 0
    while (i < names.length) {
      val e = new ZipArchiveEntry(names(i))
      e.setTime(0L)
      out.putArchiveEntry(e)
      out.write(bodies(i))
      out.closeArchiveEntry()
      i += 1
    }
    out.close()
    bos.toByteArray
  }

  def unzip(data: Array[Byte]): (Array[String], Array[Array[Byte]]) = {
    val in = new ZipArchiveInputStream(new ByteArrayInputStream(data))
    val names = Array.newBuilder[String]
    val bodies = Array.newBuilder[Array[Byte]]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        names += e.getName
        bodies += in.readAllBytes()
      }
      e = in.getNextEntry
    }
    (names.result(), bodies.result())
  }

  /** Recursive-character text chunking (reference `text_chunker`
    * strategy `recursive_character`,
    * internal/impl/text/text_chunker_processor.go:58-62; algorithm per
    * the public langchain textsplitter semantics): split on the first
    * separator present in the text, merge adjacent splits up to
    * `chunkSize` (codepoints) with `overlap` carried between chunks,
    * and recurse with the remaining separators on oversized splits.
    */
  def chunkRecursive(text: String, seps: Array[String],
                     chunkSize: Int, overlap: Int): Array[String] = {
    def lengthOf(s: String): Int = s.codePointCount(0, s.length)

    def mergeSplits(splits: Seq[String], sep: String): Seq[String] = {
      val docs = Seq.newBuilder[String]
      var current = Vector.empty[String]
      var total = 0
      val sepLen = lengthOf(sep)
      def joined(parts: Seq[String]): String = parts.mkString(sep)
      splits.foreach { d =>
        val dLen = lengthOf(d)
        if (total + dLen + (if (current.nonEmpty) sepLen else 0) > chunkSize &&
            current.nonEmpty) {
          val doc = joined(current).trim
          if (doc.nonEmpty) docs += doc
          // drop from the front until within overlap budget
          while (current.nonEmpty &&
                 (total > overlap ||
                  (total + dLen + (if (current.nonEmpty) sepLen else 0) > chunkSize &&
                   total > 0))) {
            total -= lengthOf(current.head) + (if (current.size > 1) sepLen else 0)
            current = current.tail
          }
        }
        current = current :+ d
        total += dLen + (if (current.size > 1) sepLen else 0)
      }
      val last = joined(current).trim
      if (last.nonEmpty) docs += last
      docs.result()
    }

    def split(text: String, seps: List[String]): Seq[String] = {
      val (sep, rest) = seps.find(s => s.isEmpty || text.contains(s)) match {
        case Some(s) => (s, seps.drop(seps.indexOf(s) + 1))
        case None => ("", Nil)
      }
      val parts: Seq[String] =
        if (sep.isEmpty) text.map(_.toString)
        else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
      val out = Seq.newBuilder[String]
      var good = Vector.empty[String]
      parts.filter(_.nonEmpty).foreach { p =>
        if (lengthOf(p) < chunkSize) good = good :+ p
        else {
          if (good.nonEmpty) { out ++= mergeSplits(good, sep); good = Vector.empty }
          if (rest.isEmpty) out += p
          else out ++= split(p, rest)
        }
      }
      if (good.nonEmpty) out ++= mergeSplits(good, sep)
      out.result()
    }

    if (text == null || text.isEmpty) Array.empty
    else split(text, seps.toList).toArray
  }

  /** `text_chunker` strategy `markdown`
    * (internal/impl/text/text_chunker_processor.go:58-62): split at
    * heading boundaries (lines starting with #), then apply the
    * recursive merge within oversized sections so every chunk respects
    * `chunkSize`. Headings stay attached to their section body.
    */
  def chunkMarkdown(text: String, chunkSize: Int, overlap: Int): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val sections = Seq.newBuilder[String]
    val current = new StringBuilder
    text.split("\n", -1).foreach { line =>
      if (line.startsWith("#") && current.nonEmpty) {
        sections += current.toString
        current.clear()
      }
      if (current.nonEmpty) current.append('\n')
      current.append(line)
    }
    if (current.nonEmpty) sections += current.toString
    sections.result().flatMap { sec =>
      if (sec.codePointCount(0, sec.length) <= chunkSize) {
        val t = sec.trim
        if (t.isEmpty) Seq.empty else Seq(t)
      } else chunkRecursive(sec, Array("\n\n", "\n", " ", ""), chunkSize, overlap)
    }.toArray
  }

  // ── Catalyst-typed wrappers (called from generated code) ─────────────

  private def entriesOf(names: ArrayData, bodies: ArrayData): (Array[String], Array[Array[Byte]]) = {
    val n = names.numElements()
    require(bodies.numElements() == n, "names/bodies length mismatch")
    val ns = new Array[String](n)
    val bs = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      ns(i) = names.getUTF8String(i).toString
      bs(i) = bodies.getBinary(i)
      i += 1
    }
    (ns, bs)
  }

  private def entryRows(r: (Array[String], Array[Array[Byte]])): ArrayData = {
    val (ns, bs) = r
    new GenericArrayData(ns.indices.map { i =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(ns(i)), bs(i))): InternalRow
    }.toArray[Any])
  }

  def tarData(names: ArrayData, bodies: ArrayData): Array[Byte] =
    (tar _).tupled(entriesOf(names, bodies))

  def untarData(data: Array[Byte]): ArrayData = entryRows(untar(data))

  def zipData(names: ArrayData, bodies: ArrayData): Array[Byte] =
    (zip _).tupled(entriesOf(names, bodies))

  def unzipData(data: Array[Byte]): ArrayData = entryRows(unzip(data))

  def chunkData(text: UTF8String, seps: Array[String],
                chunkSize: Int, overlap: Int): ArrayData =
    new GenericArrayData(chunkRecursive(text.toString, seps, chunkSize, overlap)
      .map(UTF8String.fromString(_): Any))

  def chunkMarkdownData(text: UTF8String, chunkSize: Int, overlap: Int): ArrayData =
    new GenericArrayData(chunkMarkdown(text.toString, chunkSize, overlap)
      .map(UTF8String.fromString(_): Any))

  /** unicode_segments (bloblang methods.adoc string section; reference
    * impl internal/impl/lang/bloblang.go): segment a string into
    * grapheme clusters, words, or sentences via the JDK BreakIterator
    * (UAX #29 boundaries — no external ICU dependency).
    */
  def unicodeSegments(text: UTF8String, mode: UTF8String): ArrayData = {
    val str = text.toString
    val it = mode.toString match {
      case "word"     => java.text.BreakIterator.getWordInstance(java.util.Locale.ROOT)
      case "sentence" => java.text.BreakIterator.getSentenceInstance(java.util.Locale.ROOT)
      case _          => java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    }
    it.setText(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = it.first()
    var end = it.next()
    while (end != java.text.BreakIterator.DONE) {
      out += UTF8String.fromString(str.substring(start, end))
      start = end
      end = it.next()
    }
    new GenericArrayData(out.toArray)
  }
}
