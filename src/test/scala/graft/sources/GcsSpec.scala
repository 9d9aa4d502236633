package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.Gcs._

/** gcp_cloud_storage contracts: bearer auth, URL-encoded object
  * names, nextPageToken pagination, delete semantics.
  */
class GcsSpec extends SparkSpec {

  private def fresh = "gcst_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("bearer auth is checked per request; wrong token is a 401") {
    val name = fresh
    val svc = Gcs.register(name, "tok")
    val good = new Client(s"mem://$name", "tok")
    good.upload("b", "k", "v".getBytes(UTF_8))
    assert(svc.rejected == 0)
    val bad = new Client(s"mem://$name", "nope")
    val e = intercept[IllegalStateException] { bad.download("b", "k") }
    assert(e.getMessage.contains("401"))
    assert(svc.rejected == 1)
    Gcs.drop(name)
  }

  test("object names with spaces and slashes survive URL encoding") {
    val name = fresh
    Gcs.register(name, "tok")
    val c = new Client(s"mem://$name", "tok")
    val key = "dir name/file with spaces.json"
    c.upload("b", key, """{"x":1}""".getBytes(UTF_8))
    assert(new String(c.download("b", key), UTF_8) == """{"x":1}""")
    assert(c.list("b", prefix = "dir name/") == Seq(key))
    Gcs.drop(name)
  }

  test("list paginates via nextPageToken to exhaustion") {
    val name = fresh
    Gcs.register(name, "tok")
    val c = new Client(s"mem://$name", "tok")
    (1 to 17).foreach(i => c.upload("b", f"p/o$i%03d", "x".getBytes(UTF_8)))
    val names = c.list("b", prefix = "p/", maxResults = 5)
    assert(names.size == 17)
    assert(names == (1 to 17).map(i => f"p/o$i%03d"))
    Gcs.drop(name)
  }

  test("delete answers 204 and removes the object") {
    val name = fresh
    Gcs.register(name, "tok")
    val c = new Client(s"mem://$name", "tok")
    c.upload("b", "k", "v".getBytes(UTF_8))
    c.delete("b", "k")
    val e = intercept[IllegalStateException] { c.download("b", "k") }
    assert(e.getMessage.contains("404"))
    Gcs.drop(name)
  }
}
