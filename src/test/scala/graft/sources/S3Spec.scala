package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.S3._

/** aws_s3 contracts: SigV4 against AWS's published worked example,
  * server-side signature verification, ListObjectsV2 pagination,
  * tamper rejection.
  */
class S3Spec extends SparkSpec {
  import spark.implicits._

  private def fresh = "s3t_" + java.util.UUID.randomUUID.toString.replace("-", "")
  private val creds = Credentials("AKIDEXAMPLE",
    "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "us-east-1")

  test("SigV4 matches AWS's published worked example (GET iam ListUsers)") {
    // docs.aws.amazon.com sigv4 'complete example': 20150830T123600Z,
    // us-east-1/iam, GET /?Action=ListUsers&Version=2010-05-08. Our
    // signer additionally signs x-amz-content-sha256 (S3's always-on
    // header); with the published inputs the expected signature for
    // that 4-header form was cross-derived with an INDEPENDENT
    // python hmac/hashlib implementation whose 3-header variant
    // reproduces the doc's 5d672d79c15b13… exactly.
    val signed = SigV4.sign(creds, "iam", "GET", "/",
      Map("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      Map("host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      Array.empty, "20150830T123600Z")
    assert(signed.authorization ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-content-sha256;x-amz-date, " +
        "Signature=dd479fa8a80364edf2119ec24bebde66712ee9c9cb2b0d92eb3ab9ccdc0c3947")
  }

  test("signing-key chain matches the documented derivation") {
    // the published intermediate: kSigning for 20150830/us-east-1/iam
    val k = SigV4.signingKey(creds.secretKey, "20150830", "us-east-1",
      "iam")
    assert(k.map("%02x".format(_)).mkString ==
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("server verifies every signature; wrong secret is a 403") {
    val name = fresh
    val svc = S3.register(name, creds)
    val good = new Client(s"mem://$name", creds)
    good.put("b", "k1", "v1".getBytes(UTF_8))
    assert(new String(good.get("b", "k1"), UTF_8) == "v1")
    assert(svc.rejected == 0)
    val bad = new Client(s"mem://$name", creds.copy(secretKey = "wrong"))
    val e = intercept[IllegalStateException] { bad.get("b", "k1") }
    assert(e.getMessage.contains("403"))
    assert(svc.rejected == 1)
    S3.drop(name)
  }

  test("ListObjectsV2: continuation-token pagination walks to exhaustion") {
    val name = fresh
    S3.register(name, creds)
    val c = new Client(s"mem://$name", creds)
    (1 to 25).foreach(i => c.put("b", f"p/k$i%03d", s"v$i".getBytes(UTF_8)))
    c.put("b", "other/x", "y".getBytes(UTF_8))
    val keys = c.list("b", prefix = "p/", maxKeys = 10)
    assert(keys.size == 25, "three pages of 10/10/5")
    assert(keys.map(_._1) == (1 to 25).map(i => f"p/k$i%03d"))
    S3.drop(name)
  }

  test("delete removes; GET of a missing key is NoSuchKey") {
    val name = fresh
    S3.register(name, creds)
    val c = new Client(s"mem://$name", creds)
    c.put("b", "k", "v".getBytes(UTF_8))
    c.delete("b", "k")
    val e = intercept[IllegalStateException] { c.get("b", "k") }
    assert(e.getMessage.contains("404"))
    S3.drop(name)
  }

  test("read/write round-trip with metadata through Spark") {
    val name = fresh
    S3.register(name, creds)
    val df = Seq(("a.json", """{"v":1}"""), ("b.json", """{"v":2}"""))
      .toDF("p", "value")
    S3.write(df, s"mem://$name", creds, "lake", org.apache.spark.sql
      .functions.col("p"))
    val out = S3.read(spark, s"mem://$name", creds, "lake")
      .orderBy("value").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("""{"v":1}""", """{"v":2}"""))
    val meta = out.head.getMap[String, String](1)
    assert(meta("s3_key") == "a.json" && meta("s3_bucket") == "lake")
    assert(meta("s3_etag").nonEmpty)
    S3.drop(name)
  }
}
