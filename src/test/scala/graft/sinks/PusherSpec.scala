package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Pusher._

/** pusher contracts: request signing (verified server-side), the
  * 10-event batch limit, channel interpolation per message.
  */
class PusherSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "put_" + java.util.UUID.randomUUID.toString.replace("-", "")
  private val conf = Conf("42", "k3y", "s3cret", "mt1", "greeting")

  test("signature algorithm: HMAC-SHA256 over POST\\npath\\nsorted-query") {
    // fixed vector, recomputable by hand from the documented scheme
    val qs = signedQuery(Conf("1", "key", "secret", "c", "e"),
      "/apps/1/batch_events", """{"batch":[]}""", 1700000000L)
    assert(qs.startsWith("auth_key=key&auth_timestamp=1700000000&" +
      "auth_version=1.0&body_md5="))
    val md5 = md5Hex("""{"batch":[]}""")
    assert(qs.contains(s"body_md5=$md5"))
    val expected = hmacSha256Hex("secret",
      s"POST\n/apps/1/batch_events\nauth_key=key&auth_timestamp=1700000000&auth_version=1.0&body_md5=$md5")
    assert(qs.endsWith(s"auth_signature=$expected"))
  }

  test("events publish in 10-per-request batches; server verifies every signature") {
    val name = fresh
    val svc = Pusher.named(name)
    val df = (1 to 23).map(i => (s"ch${i % 3}", s"m$i")).toDF("ch", "value")
      .coalesce(1)
    Pusher.write(df, s"mem://$name", conf, col("ch"))
    assert(svc.rejected == 0)
    assert(svc.events.size == 23)
    assert(svc.events.map(_._2).toSet == Set("greeting"))
    assert(svc.events.count(_._1 == "ch1") == 8)
    Pusher.drop(name)
  }

  test("a wrong secret is rejected with 401 and fails the write") {
    val name = fresh
    val svc = Pusher.named(name) // server-side secret = s3cret
    val bad = conf.copy(secret = "wrong")
    val e = intercept[org.apache.spark.SparkException] {
      Pusher.write(Seq(("c", "x")).toDF("ch", "value").coalesce(1),
        s"mem://$name", bad, col("ch"))
    }
    assert(svc.rejected == 1)
    assert(e.getMessage.contains("401") ||
      Option(e.getCause).exists(_.getMessage.contains("401")))
    Pusher.drop(name)
  }

  test("a tampered body fails body_md5 verification") {
    val name = fresh
    val svc = Pusher.named(name)
    val body = """{"batch":[{"channel":"c","name":"e","data":"\"x\""}]}"""
    val qs = signedQuery(conf.copy(secret = "s3cret"),
      s"/apps/42/batch_events", body, 1700000000L)
    val resp = Pusher.memClient(name)(Seq(graft.operators.Http.Request(
      s"mem://$name/apps/42/batch_events?$qs", "POST",
      Map.empty, body + " "))).head
    assert(resp.status == 401)
    assert(svc.events.isEmpty)
    Pusher.drop(name)
  }
}
