package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.CyborgDb._

/** cyborgdb contracts: client-side sealing (AES-256-GCM, id as AAD),
  * the server-never-sees-plaintext property, wrong-key auth failure,
  * delete, api-key checks.
  */
class CyborgDbSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "cyt_" + java.util.UUID.randomUUID.toString.replace("-", "")
  private val key = Array.tabulate[Byte](32)(i => (i * 7).toByte)

  test("seal/unseal round-trips; the id is authenticated data") {
    val ct = seal(key, "item-1", "payload".getBytes(UTF_8))
    assert(new String(unseal(key, "item-1", ct), UTF_8) == "payload")
    // replay under a different id fails GCM authentication
    intercept[javax.crypto.AEADBadTagException] {
      unseal(key, "item-2", ct)
    }
    // a wrong key fails authentication, not garbage decode
    val wrong = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    intercept[javax.crypto.AEADBadTagException] {
      unseal(wrong, "item-1", ct)
    }
  }

  test("upsert stores ciphertext only; fetch unseals the vectors intact") {
    val name = fresh
    val svc = CyborgDb.register(name, "ak")
    val url = s"mem://$name"
    val df = Seq(("a", Seq(1.5f, 2.5f)), ("b", Seq(0.5f, -1.0f)))
      .toDF("id", "vec").coalesce(1)
    CyborgDb.write(df, url, "ak", "idx", key, "upsert", col("id"),
      col("vec"))
    assert(svc.plaintextSeen == 0,
      "the server must never receive a parseable plaintext vector")
    val got = fetch(url, "ak", "idx", key, Seq("a", "b"))
    assert(got("a").contains("[1.5,2.5]"))
    assert(got("b").contains("[0.5,-1.0]"))
    CyborgDb.drop(name)
  }

  test("delete removes ids; bad api key is rejected") {
    val name = fresh
    val svc = CyborgDb.register(name, "ak")
    val url = s"mem://$name"
    val df = Seq(("a", Seq(1f))).toDF("id", "vec").coalesce(1)
    CyborgDb.write(df, url, "ak", "idx", key, "upsert", col("id"),
      col("vec"))
    CyborgDb.write(df.select(col("id"), col("vec")), url, "ak", "idx",
      key, "delete", col("id"))
    assert(fetch(url, "ak", "idx", key, Seq("a")).isEmpty)
    val e = intercept[org.apache.spark.SparkException] {
      CyborgDb.write(df, url, "WRONG", "idx", key, "upsert", col("id"),
        col("vec"))
    }
    assert(e.getMessage.contains("401") ||
      Option(e.getCause).exists(_.getMessage.contains("401")))
    assert(svc.rejected == 1)
    CyborgDb.drop(name)
  }
}
