package graft.sources

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** git input contracts: native loose-object and packfile reading
  * (idx v2, OFS/REF deltas), ref resolution (loose + packed-refs),
  * tree walks, glob selection, and the commit-cursor poller —
  * fixtures are REAL repositories created by the git CLI.
  */
class GitRepoSpec extends SparkSpec {

  private def sh(cwd: Path, cmd: String*): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd.toFile)
    pb.environment().put("GIT_AUTHOR_NAME", "t")
    pb.environment().put("GIT_AUTHOR_EMAIL", "t@x")
    pb.environment().put("GIT_COMMITTER_NAME", "t")
    pb.environment().put("GIT_COMMITTER_EMAIL", "t@x")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    require(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $out")
    out
  }

  private def newRepo(): Path = {
    val dir = Files.createTempDirectory("graft_git")
    sh(dir, "git", "init", "-q", "-b", "main")
    dir
  }

  private def write(repo: Path, path: String, content: String): Unit = {
    val f = repo.resolve(path)
    Files.createDirectories(f.getParent)
    Files.writeString(f, content)
  }

  private def commit(repo: Path, msg: String): String = {
    sh(repo, "git", "add", "-A")
    sh(repo, "git", "commit", "-q", "-m", msg)
    sh(repo, "git", "rev-parse", "HEAD").trim
  }

  test("loose objects: head, commit parse, tree walk, blob contents") {
    val repo = newRepo()
    write(repo, "a.txt", "alpha")
    write(repo, "sub/dir/b.txt", "beta")
    val c1 = commit(repo, "first")
    write(repo, "a.txt", "alpha v2")
    val c2 = commit(repo, "second")
    val store = new GitRepo.Store(repo.toString)
    assert(store.head() == c2)
    val cm = store.commit(c2)
    assert(cm.message == "second")
    assert(cm.parents == Seq(c1))
    val files = store.listFiles(c2)
    assert(files.keySet == Set("a.txt", "sub/dir/b.txt"))
    assert(new String(store.blob(files("a.txt"))) == "alpha v2")
    assert(new String(store.blob(files("sub/dir/b.txt"))) == "beta")
  }

  test("packfiles: gc'd history reads through idx v2 + delta chains") {
    val repo = newRepo()
    // similar large versions force delta compression inside the pack
    val base = ("x" * 60 + "\n") * 50
    write(repo, "big.txt", base)
    commit(repo, "v1")
    write(repo, "big.txt", base + "appended line 1\n")
    commit(repo, "v2")
    write(repo, "big.txt", base + "appended line 1\nappended line 2\n")
    val c3 = commit(repo, "v3")
    sh(repo, "git", "gc", "-q", "--aggressive", "--prune=now")
    val packDir = repo.resolve(".git/objects/pack")
    assert(Files.list(packDir).toArray.exists(_.toString.endsWith(".pack")),
      "gc must have produced a packfile")
    val store = new GitRepo.Store(repo.toString)
    // gc also packs refs → the packed-refs resolution path
    assert(store.head() == c3)
    val files = store.listFiles(c3)
    assert(new String(store.blob(files("big.txt"))) ==
      base + "appended line 1\nappended line 2\n")
    // the older versions resolve through the delta chain too
    val c1 = store.commit(store.commit(c3).parents.head).parents.head
    val v1Files = store.listFiles(c1)
    assert(new String(store.blob(v1Files("big.txt"))) == base)
  }

  test("read: one message per file with path/commit metadata, globs filter") {
    val repo = newRepo()
    write(repo, "keep/x.json", """{"k":1}""")
    write(repo, "keep/y.txt", "text")
    write(repo, "skip/z.json", "{}")
    val c = commit(repo, "files")
    val out = GitRepo.read(spark, repo.toString, "main",
        include = Seq("keep/**"), exclude = Seq("**/*.txt"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == """{"k":1}""")
    val meta = out.head.getMap[String, String](1)
    assert(meta("git_file_path") == "keep/x.json")
    assert(meta("git_commit") == c)
    assert(meta("git_deleted") == "false")
  }

  test("poller: full first sweep, then diff-only with deletion tombstones") {
    val repo = newRepo()
    write(repo, "a.txt", "1")
    write(repo, "b.txt", "2")
    commit(repo, "seed")
    val p = GitRepo.poller(repo.toString, "main")
    val (first, c1) = p(None)
    assert(first.map(_._2("git_file_path")) == Vector("a.txt", "b.txt"))
    // no new commits: cursor holds, nothing re-emits
    assert(p(c1) == (Vector.empty, c1))
    // change one, delete one, add one
    write(repo, "a.txt", "1 changed")
    Files.delete(repo.resolve("b.txt"))
    write(repo, "c.txt", "3")
    commit(repo, "evolve")
    val (second, c2) = p(c1)
    assert(c2 != c1)
    val byPath = second.map(e => e._2("git_file_path") ->
      (e._1, e._2("git_deleted"))).toMap
    assert(byPath("a.txt") == (("1 changed", "false")))
    assert(byPath("c.txt") == (("3", "false")))
    assert(byPath("b.txt") == (("", "true")))
  }
}
