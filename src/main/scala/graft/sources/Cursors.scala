package graft.sources

import scala.collection.concurrent.TrieMap

/** Minimal read-write KV for input-cursor persistence (jira's JQL
  * cursor, discord's last_message_id, twitter's last tweet id) — the
  * writable subset of the cache-resource contract. The config runner's
  * relational cache views are read-only snapshots; a polling input's
  * cursor needs read-write, so cursor-bearing inputs resolve their
  * `cache`/`cursor.cache` label to the backing FILE store instead.
  */
object Cursors {

  trait Store {
    def get(key: String): Option[String]
    def set(key: String, value: String): Unit
  }

  /** In-process store for tests and single-session incremental reads. */
  final class MemStore extends Store {
    private val m = TrieMap.empty[String, String]
    def get(key: String): Option[String] = m.get(key)
    def set(key: String, value: String): Unit = m.update(key, value)
  }

  /** One file per key under `dir` — the same layout as the `file` cache
    * backend (caches/file.adoc), so a config's cursor cache pointing at
    * a file cache resource persists across runs.
    */
  final class FileStore(dir: String) extends Store {
    private val base = java.nio.file.Paths.get(dir)
    def get(key: String): Option[String] = {
      val p = base.resolve(key)
      if (java.nio.file.Files.exists(p))
        Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      else None
    }
    def set(key: String, value: String): Unit = {
      java.nio.file.Files.createDirectories(base)
      java.nio.file.Files.write(base.resolve(key), value.getBytes("UTF-8"))
    }
  }
}
