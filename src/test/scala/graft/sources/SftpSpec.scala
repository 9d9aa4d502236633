package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** sftp/SSH contracts: the full handshake (kex, host-key signature,
  * cipher+MAC packets, password auth, channels) over a REAL TCP
  * socket, sftp framing across channel boundaries, and the RFC 4253
  * key-derivation function against an independent derivation.
  */
class SftpSpec extends SparkSpec {
  import spark.implicits._

  test("RFC 4253 7.2 key derivation matches an independent construction") {
    // independent reimplementation with plain MessageDigest calls,
    // written from the RFC text (K as mpint, then H, letter, session)
    val k = Array.tabulate[Byte](32)(i => (i + 1).toByte)
    val h = Array.tabulate[Byte](32)(i => (0x40 + i).toByte)
    val sid = h
    def mpint(b: Array[Byte]): Array[Byte] = {
      val t = b.dropWhile(_ == 0)
      val body = if ((t(0) & 0x80) != 0) 0.toByte +: t else t
      Array[Byte](0, 0, 0, body.length.toByte) ++ body
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val k1 = md.digest(mpint(k) ++ h ++ Array('A'.toByte) ++ sid)
    assert(Ssh.deriveKey(k, h, 'A', sid, 32).toSeq == k1.toSeq)
    // extension: K2 = HASH(K || H || K1), 48 > 32 forces one round
    val k2 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(mpint(k) ++ h ++ k1)
    assert(Ssh.deriveKey(k, h, 'A', sid, 48).toSeq ==
      (k1 ++ k2).take(48).toSeq)
  }

  test("ed25519 raw key and signature blobs verify round-trip") {
    val kp = Ssh.Curve.ed25519KeyPair()
    val raw = Ssh.Curve.ed25519PublicRaw(kp.getPublic)
    assert(raw.length == 32)
    val data = "exchange hash".getBytes(UTF_8)
    val sig = Ssh.Curve.ed25519Sign(kp.getPrivate, data)
    assert(sig.length == 64)
    assert(Ssh.Curve.ed25519Verify(raw, data, sig))
    assert(!Ssh.Curve.ed25519Verify(raw, "tampered".getBytes(UTF_8), sig))
  }

  test("full stack: upload, list, download through the real SSH handshake") {
    val server = new Sftp.Server(user = "u1", password = "pw1")
    val port = server.start()
    try {
      val c = new Sftp.Client("127.0.0.1", port, "u1", "pw1")
      try {
        c.upload("/data/a.txt", "alpha".getBytes(UTF_8))
        c.upload("/data/b.txt", ("b" * 100000).getBytes(UTF_8)) // multi-chunk
        assert(c.listDir("/data") == Seq("a.txt", "b.txt"))
        assert(new String(c.download("/data/a.txt"), UTF_8) == "alpha")
        assert(c.download("/data/b.txt").length == 100000)
        val e = intercept[IllegalStateException] {
          c.download("/data/missing.txt")
        }
        assert(e.getMessage.contains("status 2")) // NO_SUCH_FILE
      } finally c.close()
    } finally server.stop()
  }

  test("wrong password fails authentication") {
    val server = new Sftp.Server(user = "u1", password = "right")
    val port = server.start()
    try {
      intercept[Exception] {
        new Sftp.Client("127.0.0.1", port, "u1", "wrong")
      }
    } finally server.stop()
  }

  test("Spark read/write round-trip over the wire") {
    val server = new Sftp.Server(user = "u", password = "p")
    val port = server.start()
    try {
      val df = Seq(("/in/x.json", """{"v":1}"""), ("/in/y.json", """{"v":2}"""))
        .toDF("p", "value").coalesce(1)
      Sftp.write(df, "127.0.0.1", port, "u", "p", col("p"))
      val out = Sftp.read(spark, "127.0.0.1", port, "u", "p", "/in")
        .orderBy("value").collect()
      assert(out.map(_.getString(0)).toSeq ==
        Seq("""{"v":1}""", """{"v":2}"""))
      assert(out.head.getMap[String, String](1)("sftp_path") == "/in/x.json")
    } finally server.stop()
  }
}
