package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.GoogleDrive._

/** google_drive contracts: query subset, projection fields,
  * pagination, download media, auth, per-item errors.
  */
class GoogleDriveSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "gdt_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("search: name-contains query, projection shape, pagination") {
    val name = fresh
    val svc = GoogleDrive.register(name, "tok", pageSize = 5)
    (1 to 12).foreach(i =>
      svc.add(s"id$i", s"report_$i.txt", "text/plain", s"body$i"))
    svc.add("idx", "other.json", "application/json", "{}")
    val c = new Client(s"mem://$name", "tok")
    val hits = c.search("name contains 'report_'",
      Seq("id", "name", "mimeType", "size"), pageSize = 5)
    assert(hits.size == 12, "three pages of 5/5/2")
    assert(hits.head.contains("\"id\":\"id1\""))
    assert(hits.head.contains("\"mimeType\":\"text/plain\""))
    assert(c.search("", Seq("id"), 50).size == 13, "empty query = all")
    GoogleDrive.drop(name)
  }

  test("download: alt=media returns the body; missing id is 404") {
    val name = fresh
    val svc = GoogleDrive.register(name, "tok")
    svc.add("f1", "a.txt", "text/plain", "file body")
    val c = new Client(s"mem://$name", "tok")
    assert(c.download("f1") == "file body")
    val e = intercept[IllegalStateException] { c.download("nope") }
    assert(e.getMessage.contains("404"))
    GoogleDrive.drop(name)
  }

  test("listLabels: label resources for a file; missing file 404") {
    val name = fresh
    val svc = GoogleDrive.register(name, "tok")
    svc.add("f1", "a.txt", "text/plain", "x")
    svc.labels("f1") = Seq("""{"id":"lbl1","fields":{}}""")
    val c = new Client(s"mem://$name", "tok")
    assert(c.listLabels("f1") == Seq("""{"id":"lbl1","fields":{}}"""))
    svc.add("f2", "b.txt", "text/plain", "y")
    assert(c.listLabels("f2").isEmpty)
    val e = intercept[IllegalStateException] { c.listLabels("ghost") }
    assert(e.getMessage.contains("404"))
    GoogleDrive.drop(name)
  }

  test("processors: search replaces content with the array; bad token errors") {
    val name = fresh
    val svc = GoogleDrive.register(name, "tok")
    svc.add("f1", "x.txt", "text/plain", "B")
    val df = Seq(("name contains 'x'", "")).toDF("q", "value")
    val searched = GoogleDrive.searchProcessor(df, s"mem://$name", "tok",
        col("q")).select("value").as[String].collect().head
    assert(searched.startsWith("""[{"id":"f1""""))
    val bad = GoogleDrive.searchProcessor(df, s"mem://$name", "wrong",
        col("q")).select("error").as[String].collect().head
    assert(bad.contains("401"))
    assert(svc.rejected == 1)
    GoogleDrive.drop(name)
  }
}
