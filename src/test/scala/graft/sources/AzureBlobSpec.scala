package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.AzureBlob._

/** azure_blob_storage contracts: the Shared Key string-to-sign shape,
  * server-side verification, NextMarker pagination, blob lifecycle.
  */
class AzureBlobSpec extends SparkSpec {

  private def fresh = "azt_" + java.util.UUID.randomUUID.toString.replace("-", "")
  private val acct = Account("testacct",
    java.util.Base64.getEncoder.encodeToString(
      "0123456789abcdef0123456789abcdef".getBytes(UTF_8)))

  test("string-to-sign: 14 standard lines + x-ms headers + canonical resource") {
    val sts = SharedKey.stringToSign("testacct", "PUT",
      Map("x-ms-date" -> "Fri, 26 Jun 2015 23:39:12 GMT",
        "x-ms-version" -> "2021-08-06",
        "x-ms-blob-type" -> "BlockBlob",
        "Content-Length" -> "11",
        "Content-Type" -> "text/plain"),
      "/c1/blob.txt",
      Map("comp" -> "metadata", "restype" -> "container"))
    val lines = sts.split("\n", -1)
    assert(lines(0) == "PUT")
    assert(lines(3) == "11")             // Content-Length
    assert(lines(5) == "text/plain")     // Content-Type
    assert(lines(6) == "")               // Date empty (x-ms-date wins)
    // canonicalized x-ms headers: sorted, lowercase
    assert(lines(12) == "x-ms-blob-type:BlockBlob")
    assert(lines(13) == "x-ms-date:Fri, 26 Jun 2015 23:39:12 GMT")
    assert(lines(14) == "x-ms-version:2021-08-06")
    // canonical resource with sorted lowercase query lines
    assert(lines(15) == "/testacct/c1/blob.txt")
    assert(lines(16) == "comp:metadata")
    assert(lines(17) == "restype:container")
    // zero-length bodies sign Content-Length as EMPTY (2015-02-21+)
    val sts0 = SharedKey.stringToSign("a", "GET",
      Map("Content-Length" -> "0"), "/c", Map.empty)
    assert(sts0.split("\n", -1)(3) == "")
  }

  test("server verifies Shared Key; a wrong account key is a 403") {
    val name = fresh
    val svc = AzureBlob.register(name, acct)
    val good = new Client(s"mem://$name", acct)
    good.putBlob("c", "k", "v".getBytes(UTF_8))
    assert(new String(good.getBlob("c", "k"), UTF_8) == "v")
    assert(svc.rejected == 0)
    val bad = new Client(s"mem://$name", acct.copy(base64Key =
      java.util.Base64.getEncoder.encodeToString("wrong key!".getBytes)))
    val e = intercept[IllegalStateException] { bad.getBlob("c", "k") }
    assert(e.getMessage.contains("403"))
    assert(svc.rejected == 1)
    AzureBlob.drop(name)
  }

  test("put requires x-ms-blob-type: BlockBlob; delete answers 202") {
    val name = fresh
    AzureBlob.register(name, acct)
    val c = new Client(s"mem://$name", acct)
    c.putBlob("c", "k", "v".getBytes(UTF_8))
    c.deleteBlob("c", "k")
    val e = intercept[IllegalStateException] { c.getBlob("c", "k") }
    assert(e.getMessage.contains("404"))
    AzureBlob.drop(name)
  }

  test("listing paginates on NextMarker to exhaustion") {
    val name = fresh
    AzureBlob.register(name, acct)
    val c = new Client(s"mem://$name", acct)
    (1 to 23).foreach(i =>
      c.putBlob("c", f"p/b$i%03d", s"v$i".getBytes(UTF_8)))
    c.putBlob("c", "q/other", "x".getBytes(UTF_8))
    val names = c.list("c", prefix = "p/", maxResults = 10)
    assert(names.size == 23)
    assert(names == (1 to 23).map(i => f"p/b$i%03d"))
    AzureBlob.drop(name)
  }
}
