package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.zip.Inflater

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `git` input (internal/impl/git/input.go — contract only, no code
  * ported: the reference uses the go-git library; this reads the
  * PUBLIC on-disk git object formats natively):
  *
  *   - loose objects: zlib(`<type> <size>\0<body>`);
  *   - packfiles: idx v2 (fanout + sha table + 4/8-byte offsets) and
  *     pack v2 entries (varint type+size headers, zlib bodies,
  *     OFS_DELTA/REF_DELTA with the copy/insert delta opcodes);
  *   - refs: `.git/HEAD` → branch ref → loose ref file or
  *     `packed-refs`;
  *   - commit/tree parsing and recursive tree walks.
  *
  * The input surface matches the reference: one message per file at
  * the checked-out commit (include/exclude globs), metadata
  * `git_file_path` / `git_commit` / `git_deleted`; the poller's
  * cursor IS the delivered commit hash — each sweep diffs
  * `cursor..HEAD` and emits changed files plus deletion tombstones
  * (input.go:195's empty-content deleted messages).
  *
  * Scale shape: the object store reads driver-side (git history is a
  * single-writer structure, same admission class as every cursor
  * source); file payloads distribute after listing.
  */
object GitRepo {

  final case class TreeEntry(mode: String, name: String, hash: String)
  final case class Commit(tree: String, parents: Seq[String],
                          message: String)

  /** Read-only native object store over `.git/`. */
  final class Store(gitDir: Path) {

    def this(repoRoot: String) =
      this {
        val root = Paths.get(repoRoot)
        val dotGit = root.resolve(".git")
        if (Files.isDirectory(dotGit)) dotGit else root // bare repo
      }

    // ---- refs ----

    def head(): String = {
      val h = new String(Files.readAllBytes(gitDir.resolve("HEAD")),
        UTF_8).trim
      if (h.startsWith("ref: ")) resolveRef(h.stripPrefix("ref: "))
      else h
    }

    def resolveRef(ref: String): String = {
      val f = gitDir.resolve(ref)
      if (Files.exists(f))
        new String(Files.readAllBytes(f), UTF_8).trim
      else {
        val packed = gitDir.resolve("packed-refs")
        require(Files.exists(packed), s"git: unknown ref $ref")
        Files.readAllLines(packed).toArray(Array.empty[String])
          .filterNot(l => l.startsWith("#") || l.startsWith("^"))
          .collectFirst {
            case l if l.endsWith(" " + ref) => l.split(" ").head
          }.getOrElse(throw new IllegalArgumentException(
            s"git: ref not found: $ref"))
      }
    }

    def branch(name: String): String = resolveRef(s"refs/heads/$name")

    // ---- object access ----

    /** (type, body) for a hash — loose first, then packs. */
    def readObject(hash: String): (String, Array[Byte]) = {
      val loose = gitDir.resolve("objects")
        .resolve(hash.substring(0, 2)).resolve(hash.substring(2))
      if (Files.exists(loose)) {
        val raw = inflate(Files.readAllBytes(loose))
        val nul = raw.indexOf(0)
        val header = new String(raw, 0, nul, UTF_8)
        val Array(tpe, _) = header.split(" ", 2)
        (tpe, raw.slice(nul + 1, raw.length))
      } else readPacked(hash).getOrElse(
        throw new IllegalArgumentException(s"git: object not found: $hash"))
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new IllegalStateException(
          "git: truncated zlib stream")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }

    // ---- packfiles ----

    private lazy val packs: Seq[(Path, Path)] = {
      val dir = gitDir.resolve("objects").resolve("pack")
      if (!Files.isDirectory(dir)) Nil
      else {
        import scala.jdk.CollectionConverters._
        Files.list(dir).iterator().asScala.toSeq
          .filter(_.toString.endsWith(".idx"))
          .map(idx => (idx,
            Paths.get(idx.toString.stripSuffix(".idx") + ".pack")))
      }
    }

    private def readPacked(hash: String): Option[(String, Array[Byte])] =
      packs.iterator.flatMap { case (idxPath, packPath) =>
        offsetInPack(idxPath, hash).map(off =>
          readPackObject(Files.readAllBytes(packPath), off))
      }.nextOption()

    /** idx v2: fanout[256] → sha table binary search → offset. */
    private def offsetInPack(idxPath: Path, hash: String): Option[Long] = {
      val b = Files.readAllBytes(idxPath)
      require((b(0) & 0xFF) == 0xFF && b(1) == 't' && b(2) == 'O' &&
        b(3) == 'c', "git: not an idx v2 file")
      def u32(i: Int): Long =
        (0 until 4).foldLeft(0L)((a, j) => (a << 8) | (b(i + j) & 0xFF))
      val want = hexToBytes(hash)
      val first = want(0) & 0xFF
      val lo = if (first == 0) 0L else u32(8 + (first - 1) * 4)
      val hi = u32(8 + first * 4)
      val total = u32(8 + 255 * 4)
      val shaBase = 8 + 256 * 4
      var l = lo
      var h = hi - 1
      var found = -1L
      while (l <= h && found < 0) {
        val mid = (l + h) / 2
        val cmp = compareSha(b, shaBase + (mid * 20).toInt, want)
        if (cmp == 0) found = mid
        else if (cmp < 0) l = mid + 1
        else h = mid - 1
      }
      if (found < 0) None
      else {
        val offBase = shaBase + (total * 20).toInt + (total * 4).toInt
        val off = u32(offBase + (found * 4).toInt)
        if ((off & 0x80000000L) == 0) Some(off)
        else {
          // large-offset table entry (8 bytes)
          val largeBase = offBase + (total * 4).toInt
          val li = (off & 0x7FFFFFFFL).toInt
          Some((0 until 8).foldLeft(0L)((a, j) =>
            (a << 8) | (b(largeBase + li * 8 + j) & 0xFF)))
        }
      }
    }

    private def compareSha(b: Array[Byte], off: Int,
                           want: Array[Byte]): Int = {
      var i = 0
      while (i < 20) {
        val c = (b(off + i) & 0xFF) - (want(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      0
    }

    private def hexToBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

    /** One pack entry at `offset`, resolving delta chains. */
    private def readPackObject(pack: Array[Byte],
                               offset: Long): (String, Array[Byte]) = {
      var pos = offset.toInt
      var c = pack(pos) & 0xFF
      pos += 1
      val tpe = (c >> 4) & 0x7
      var size = (c & 0x0F).toLong
      var shift = 4
      while ((c & 0x80) != 0) {
        c = pack(pos) & 0xFF; pos += 1
        size |= (c & 0x7FL) << shift
        shift += 7
      }
      tpe match {
        case 1 => ("commit", inflateFrom(pack, pos))
        case 2 => ("tree", inflateFrom(pack, pos))
        case 3 => ("blob", inflateFrom(pack, pos))
        case 4 => ("tag", inflateFrom(pack, pos))
        case 6 => // OFS_DELTA: negative offset varint (+1 folding)
          var b0 = pack(pos) & 0xFF; pos += 1
          var rel = (b0 & 0x7F).toLong
          while ((b0 & 0x80) != 0) {
            b0 = pack(pos) & 0xFF; pos += 1
            rel = ((rel + 1) << 7) | (b0 & 0x7FL)
          }
          val (baseType, base) = readPackObject(pack, offset - rel)
          (baseType, applyDelta(base, inflateFrom(pack, pos)))
        case 7 => // REF_DELTA: 20-byte base sha
          val baseSha = pack.slice(pos, pos + 20)
            .map("%02x".format(_)).mkString
          pos += 20
          val (baseType, base) = readObject(baseSha)
          (baseType, applyDelta(base, inflateFrom(pack, pos)))
        case other => throw new IllegalStateException(
          s"git: unknown pack object type $other")
      }
    }

    private def inflateFrom(pack: Array[Byte], pos: Int): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(pack, pos, pack.length - pos)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new IllegalStateException(
          "git: truncated pack entry")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }

    /** The documented delta opcodes: copy (MSB set — offset/size
      * nibble flags) and insert (literal bytes).
      */
    private def applyDelta(base: Array[Byte],
                           delta: Array[Byte]): Array[Byte] = {
      var pos = 0
      def varint(): Long = {
        var v = 0L
        var shift = 0
        var c = 0
        do {
          c = delta(pos) & 0xFF; pos += 1
          v |= (c & 0x7FL) << shift
          shift += 7
        } while ((c & 0x80) != 0)
        v
      }
      val baseSize = varint()
      require(baseSize == base.length,
        s"git: delta base size $baseSize != ${base.length}")
      val resultSize = varint()
      val out = new java.io.ByteArrayOutputStream(resultSize.toInt)
      while (pos < delta.length) {
        val op = delta(pos) & 0xFF
        pos += 1
        if ((op & 0x80) != 0) { // copy
          var off = 0L
          var size = 0L
          (0 until 4).foreach { i =>
            if ((op & (1 << i)) != 0) {
              off |= (delta(pos) & 0xFFL) << (8 * i); pos += 1
            }
          }
          (0 until 3).foreach { i =>
            if ((op & (0x10 << i)) != 0) {
              size |= (delta(pos) & 0xFFL) << (8 * i); pos += 1
            }
          }
          if (size == 0) size = 0x10000L
          out.write(base, off.toInt, size.toInt)
        } else { // insert
          require(op != 0, "git: delta opcode 0 is reserved")
          out.write(delta, pos, op)
          pos += op
        }
      }
      require(out.size() == resultSize, "git: delta result size mismatch")
      out.toByteArray
    }

    // ---- object parsing ----

    def commit(hash: String): Commit = {
      val (tpe, body) = readObject(hash)
      require(tpe == "commit", s"git: $hash is a $tpe, not a commit")
      val text = new String(body, UTF_8)
      val (headers, message) = text.span(_ != '\n') match {
        case _ =>
          val idx = text.indexOf("\n\n")
          (text.substring(0, math.max(idx, 0)).split("\n").toSeq,
            if (idx >= 0) text.substring(idx + 2) else "")
      }
      Commit(
        headers.find(_.startsWith("tree ")).map(_.drop(5)).getOrElse(
          throw new IllegalStateException("git: commit without tree")),
        headers.filter(_.startsWith("parent ")).map(_.drop(7)),
        message.trim)
    }

    def tree(hash: String): Seq[TreeEntry] = {
      val (tpe, body) = readObject(hash)
      require(tpe == "tree", s"git: $hash is a $tpe, not a tree")
      val out = mutable.ArrayBuffer.empty[TreeEntry]
      var pos = 0
      while (pos < body.length) {
        val sp = body.indexOf(' '.toByte, pos)
        val mode = new String(body, pos, sp - pos, UTF_8)
        val nul = body.indexOf(0.toByte, sp)
        val name = new String(body, sp + 1, nul - sp - 1, UTF_8)
        val sha = body.slice(nul + 1, nul + 21).map("%02x".format(_))
          .mkString
        out += TreeEntry(mode, name, sha)
        pos = nul + 21
      }
      out.toSeq
    }

    /** path → blob hash for the whole tree of a commit. */
    def listFiles(commitHash: String): Map[String, String] = {
      val out = mutable.LinkedHashMap.empty[String, String]
      def walk(treeHash: String, prefix: String): Unit =
        tree(treeHash).foreach { e =>
          if (e.mode.startsWith("40")) walk(e.hash, prefix + e.name + "/")
          else out(prefix + e.name) = e.hash
        }
      walk(commit(commitHash).tree, "")
      out.toMap
    }

    def blob(hash: String): Array[Byte] = {
      val (tpe, body) = readObject(hash)
      require(tpe == "blob", s"git: $hash is a $tpe, not a blob")
      body
    }
  }

  private def globMatch(pattern: String, path: String): Boolean =
    java.nio.file.FileSystems.getDefault
      .getPathMatcher("glob:" + pattern).matches(Paths.get(path))

  private def selected(path: String, include: Seq[String],
                       exclude: Seq[String]): Boolean =
    (include.isEmpty || include.exists(globMatch(_, path))) &&
      !exclude.exists(globMatch(_, path))

  /** Binary detection: git's own heuristic — a NUL byte in the first
    * 8000 bytes (buffer_is_binary in the git sources, public behavior).
    */
  private def isBinary(body: Array[Byte]): Boolean = {
    var i = 0
    val n = math.min(body.length, 8000)
    while (i < n) { if (body(i) == 0) return true; i += 1 }
    false
  }

  /** Extension → MIME type for the documented `git_mime_type` field
    * (inputs/git.adoc:60-73; the reference detects by content — an
    * extension map covers the formats this environment round-trips).
    */
  private def mimeOf(path: String): String = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "json" => "application/json"
      case "yaml" | "yml" => "application/yaml"
      case "xml" => "application/xml"
      case "html" | "htm" => "text/html"
      case "md" => "text/markdown"
      case "adoc" | "asciidoc" => "text/asciidoc"
      case "csv" => "text/csv"
      case "png" => "image/png"
      case "jpg" | "jpeg" => "image/jpeg"
      case "gif" => "image/gif"
      case "pdf" => "application/pdf"
      case "zip" => "application/zip"
      case _ => "text/plain"
    }
  }

  /** One message per file at the branch head. Binary files travel
    * base64 in the string envelope with `git_encoding: base64`
    * (inputs/git.adoc); files over `maxFileSize` are skipped like the
    * reference's max_file_size.
    */
  def read(spark: SparkSession, repo: String, branchName: String = "",
           include: Seq[String] = Nil,
           exclude: Seq[String] = Nil,
           maxFileSize: Long = 0L): DataFrame = {
    val store = new Store(repo)
    val commitHash =
      if (branchName.isEmpty) store.head() else store.branch(branchName)
    val files = store.listFiles(commitHash).toSeq
      .filter { case (p, _) => selected(p, include, exclude) }
      .sortBy(_._1)
    val rows = files.flatMap { case (path, blobHash) =>
      val body = store.blob(blobHash)
      if (maxFileSize > 0 && body.length > maxFileSize) None
      else {
        val bin = isBinary(body)
        val meta = Map(
          "git_file_path" -> path,
          "git_file_size" -> body.length.toString,
          "git_file_mode" -> "100644",
          "git_commit" -> commitHash,
          "git_mime_type" -> mimeOf(path),
          "git_is_binary" -> bin.toString,
          "git_deleted" -> "false") ++
          (if (bin) Map("git_encoding" -> "base64") else Map.empty)
        Some(org.apache.spark.sql.Row(
          if (bin) java.util.Base64.getEncoder.encodeToString(body)
          else new String(body, UTF_8),
          meta, null))
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(8, rows.size))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("metadata",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField("error",
          org.apache.spark.sql.types.StringType))))
  }

  /** PollStream poller: cursor = delivered commit. First sweep emits
    * the full checkout; later sweeps diff cursor..HEAD and emit
    * changed files + deletion tombstones (empty content,
    * git_deleted=true — input.go:195).
    */
  def poller(repo: String, branchName: String = "",
             include: Seq[String] = Nil,
             exclude: Seq[String] = Nil): PollStream.Poller = cursor => {
    val store = new Store(repo)
    val headHash =
      if (branchName.isEmpty) store.head() else store.branch(branchName)
    cursor match {
      case Some(c) if c == headHash => (Vector.empty, cursor)
      case None =>
        val out = store.listFiles(headHash).toSeq
          .filter { case (p, _) => selected(p, include, exclude) }
          .sortBy(_._1).map { case (path, blobHash) =>
            (new String(store.blob(blobHash), UTF_8),
              Map("git_file_path" -> path, "git_commit" -> headHash,
                "git_deleted" -> "false"))
          }
        (out.toVector, Some(headHash))
      case Some(prev) =>
        val before = store.listFiles(prev)
        val after = store.listFiles(headHash)
        val changed = after.toSeq
          .filter { case (p, h) =>
            !before.get(p).contains(h) && selected(p, include, exclude) }
          .sortBy(_._1).map { case (path, blobHash) =>
            (new String(store.blob(blobHash), UTF_8),
              Map("git_file_path" -> path, "git_commit" -> headHash,
                "git_deleted" -> "false"))
          }
        val deleted = (before.keySet -- after.keySet).toSeq.sorted
          .filter(selected(_, include, exclude)).map { path =>
            ("", Map("git_file_path" -> path, "git_commit" -> headHash,
              "git_deleted" -> "true"))
          }
        ((changed ++ deleted).toVector, Some(headHash))
    }
  }
}
