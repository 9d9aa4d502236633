package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `memcached` cache (internal/impl/memcached/cache.go — contract
  * only, no code ported: the reference wraps a client library; this
  * speaks the PUBLIC memcached TEXT protocol directly):
  *
  *   - `set/add/replace <key> <flags> <exptime> <bytes>\r\n<data>\r\n`
  *     → `STORED` / `NOT_STORED`;
  *   - `get <key> [<key>…]\r\n` → `VALUE <key> <flags> <bytes>\r\n
  *     <data>\r\n … END\r\n` (multi-get in one round-trip);
  *   - `delete <key>` → `DELETED` / `NOT_FOUND`; `touch` → `TOUCHED`;
  *   - `lru_crawler metadump all` for key enumeration (the modern
  *     engine's public dump command; keys are URL-encoded).
  *
  * TTL semantics follow the engine: exptime 0 never expires;
  * exptime ≤ 2592000 (30 days) is RELATIVE seconds, larger values
  * are an absolute unix timestamp.
  *
  * The reference's `prefix` field namespaces keys; applied by the
  * [[Cache]] wrapper so multiple cache resources share one cluster.
  *
  * The wire client talks to real `host:port` TCP or to an in-process
  * [[Server]] via `mem://name` — the same request/response text runs
  * either way, and the spec drives a REAL loopback socket.
  */
object Memcached {

  /** One memcached node: the text-protocol state machine over an
    * injectable clock (TTL contracts are clock-driven, not sleeps).
    */
  final class Server(var now: () => Long = () => System.currentTimeMillis()) {
    private val data =
      mutable.LinkedHashMap.empty[String, (Array[Byte], Int, Long)]
    // (value, flags, expireAtMillis; 0 = never)

    private def expired(k: String): Boolean = data.get(k) match {
      case Some((_, _, exp)) if exp > 0 && exp <= now() =>
        data.remove(k); true
      case None => true
      case _ => false
    }

    private def expiry(exptime: Long): Long =
      if (exptime == 0) 0L
      else if (exptime <= 2592000L) now() + exptime * 1000L
      else exptime * 1000L // absolute unix seconds

    /** Handle one wire request (command line + optional data block),
      * return the wire response.
      */
    def exec(request: String): String = synchronized {
      val nl = request.indexOf("\r\n")
      require(nl >= 0, "memcached: unterminated command")
      val line = request.substring(0, nl)
      val parts = line.split(" ")
      parts(0) match {
        case "set" | "add" | "replace" =>
          val (key, flags, exptime, bytes) =
            (parts(1), parts(2).toInt, parts(3).toLong, parts(4).toInt)
          val data0 = request.substring(nl + 2, nl + 2 + bytes)
          val exists = !expired(key)
          val store = parts(0) match {
            case "add" => !exists
            case "replace" => exists
            case _ => true
          }
          if (store) {
            data(key) = (data0.getBytes("UTF-8"), flags, expiry(exptime))
            "STORED\r\n"
          } else "NOT_STORED\r\n"
        case "get" | "gets" =>
          val sb = new StringBuilder
          parts.drop(1).foreach { key =>
            if (!expired(key)) {
              val (v, flags, _) = data(key)
              val s = new String(v, "UTF-8")
              sb.append(s"VALUE $key $flags ${v.length}\r\n$s\r\n")
            }
          }
          sb.append("END\r\n").toString
        case "delete" =>
          if (!expired(parts(1)) && data.remove(parts(1)).isDefined)
            "DELETED\r\n"
          else "NOT_FOUND\r\n"
        case "touch" =>
          if (expired(parts(1))) "NOT_FOUND\r\n"
          else {
            val (v, f, _) = data(parts(1))
            data(parts(1)) = (v, f, expiry(parts(2).toLong))
            "TOUCHED\r\n"
          }
        case "incr" | "decr" =>
          if (expired(parts(1))) "NOT_FOUND\r\n"
          else {
            val (v, f, e) = data(parts(1))
            val cur = new String(v, "UTF-8").trim.toLong
            val delta = parts(2).toLong
            val next = if (parts(0) == "incr") cur + delta
                       else math.max(0L, cur - delta)
            data(parts(1)) = (next.toString.getBytes("UTF-8"), f, e)
            s"$next\r\n"
          }
        case "lru_crawler" if parts.length >= 3 &&
            parts(1) == "metadump" =>
          val sb = new StringBuilder
          data.keys.toSeq.foreach { k =>
            if (!expired(k)) {
              val enc = java.net.URLEncoder.encode(k, "UTF-8")
              val (_, _, exp) = data(k)
              sb.append(s"key=$enc exp=${if (exp == 0) -1 else exp / 1000} la=0 cas=0 fetch=no cls=1 size=0\r\n")
            }
          }
          sb.append("END\r\n").toString
        case "flush_all" => data.clear(); "OK\r\n"
        case "version" => "VERSION 1.6.0-graft\r\n"
        case other => s"ERROR\r\n"
      }
    }

    def size: Int = synchronized {
      data.keys.toSeq.count(k => !expired(k))
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Server]()
  def named(name: String): Server =
    registry.computeIfAbsent(name, _ => new Server())
  def drop(name: String): Unit = registry.remove(name)

  /** One wire round-trip: request text → response text. */
  type Transport = String => String

  def transportFor(addr: String): Transport =
    if (addr.startsWith("mem://")) named(addr.stripPrefix("mem://")).exec
    else { req =>
      // one connection per round-trip keeps the client stateless on
      // executors; production would pool (the reference's client does)
      val Array(host, port) = addr.split(":", 2)
      val sock = new java.net.Socket(host, port.toInt)
      try {
        sock.getOutputStream.write(req.getBytes("UTF-8"))
        sock.getOutputStream.flush()
        val in = sock.getInputStream
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var done = false
        while (!done) {
          val n = in.read(tmp)
          if (n < 0) done = true
          else {
            buf.write(tmp, 0, n)
            val s = buf.toString("UTF-8")
            done = s.endsWith("END\r\n") || s.endsWith("STORED\r\n") ||
              s.endsWith("NOT_STORED\r\n") || s.endsWith("DELETED\r\n") ||
              s.endsWith("NOT_FOUND\r\n") || s.endsWith("TOUCHED\r\n") ||
              s.endsWith("OK\r\n") || s.endsWith("ERROR\r\n") ||
              (s.endsWith("\r\n") && s.stripSuffix("\r\n").forall(c =>
                c.isDigit || c == '-'))
          }
        }
        buf.toString("UTF-8")
      } finally sock.close()
    }

  /** Typed client with the reference's `prefix` namespace + TTL. */
  final class Cache(addr: String, prefix: String = "",
                    defaultTtlSec: Long = 0) extends Serializable {
    @transient private lazy val t = transportFor(addr)
    private def k(key: String) = prefix + key

    def get(key: String): Option[String] = {
      val resp = t(s"get ${k(key)}\r\n")
      parseValues(resp).headOption.map(_._2)
    }

    def getMulti(keys: Seq[String]): Map[String, String] =
      if (keys.isEmpty) Map.empty
      else parseValues(t(s"get ${keys.map(k).mkString(" ")}\r\n"))
        .map { case (key, v) => key.stripPrefix(prefix) -> v }.toMap

    def set(key: String, value: String,
            ttlSec: Long = defaultTtlSec): Boolean =
      storeCmd("set", key, value, ttlSec) == "STORED"

    def add(key: String, value: String,
            ttlSec: Long = defaultTtlSec): Boolean =
      storeCmd("add", key, value, ttlSec) == "STORED"

    def replace(key: String, value: String,
                ttlSec: Long = defaultTtlSec): Boolean =
      storeCmd("replace", key, value, ttlSec) == "STORED"

    def delete(key: String): Boolean =
      t(s"delete ${k(key)}\r\n").startsWith("DELETED")

    /** Enumerate keys under the prefix via `lru_crawler metadump`. */
    def keys(): Seq[String] = {
      val resp = t("lru_crawler metadump all\r\n")
      resp.split("\r\n").toSeq.filter(_.startsWith("key="))
        .map { l =>
          java.net.URLDecoder.decode(
            l.split(" ").head.stripPrefix("key="), "UTF-8")
        }
        .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
    }

    private def storeCmd(cmd: String, key: String, value: String,
                         ttl: Long): String = {
      val bytes = value.getBytes("UTF-8")
      t(s"$cmd ${k(key)} 0 $ttl ${bytes.length}\r\n$value\r\n")
        .stripSuffix("\r\n")
    }

    private def parseValues(resp: String): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      var rest = resp
      while (rest.startsWith("VALUE ")) {
        val nl = rest.indexOf("\r\n")
        val header = rest.substring(6, nl).split(" ")
        val len = header(2).toInt
        val v = rest.substring(nl + 2, nl + 2 + len)
        out += ((header(0), v))
        rest = rest.substring(nl + 2 + len + 2)
      }
      out.result()
    }
  }

  /** Cursors-store adapter (cursor persistence over memcached). */
  def store(addr: String, prefix: String = ""): Cursors.Store = {
    val c = new Cache(addr, prefix)
    new Cursors.Store {
      def get(key: String): Option[String] = c.get(key)
      def set(key: String, value: String): Unit = c.set(key, value)
    }
  }

  /** Materialize the (prefixed) keyspace as a (key, value) DataFrame
    * for the relational `cache` processor: metadump enumerates, one
    * multi-get per 64-key chunk hydrates.
    */
  def cacheView(spark: SparkSession, addr: String,
                prefix: String = ""): DataFrame = {
    val c = new Cache(addr, prefix)
    val pairs = c.keys().grouped(64).flatMap(ks => c.getMulti(ks)).toSeq
    import spark.implicits._
    pairs.toDF("key", "value")
  }
}
