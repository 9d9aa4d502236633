package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** hdfs (WebHDFS) contracts: two-step CREATE, OPEN redirects,
  * LISTSTATUS shape, per-file messages with hdfs_path metadata.
  */
class HdfsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "hdt_" + java.util.UUID.randomUUID.toString.replace("-", "")

  test("write: namenode 307 then datanode PUT; files land by path") {
    val name = fresh
    val svc = Hdfs.named(name)
    val df = Seq(("a.txt", "alpha"), ("b.txt", "beta")).toDF("p", "value")
    Hdfs.write(df, s"mem://$name", "/data", col("p"))
    assert(svc.files == scala.collection.mutable.LinkedHashMap(
      "/data/a.txt" -> "alpha", "/data/b.txt" -> "beta"))
    Hdfs.drop(name)
  }

  test("read: LISTSTATUS + whole-file OPEN, one message per file") {
    val name = fresh
    val svc = Hdfs.named(name)
    svc.files("/in/x.json") = """{"v":1}"""
    svc.files("/in/y.json") = """{"v":2}"""
    svc.files("/in/sub/z.json") = "nested: not listed at this depth"
    val out = Hdfs.read(spark, s"mem://$name", "/in")
      .orderBy("value").collect()
    assert(out.length == 2, "LISTSTATUS is non-recursive")
    assert(out.map(_.getString(0)).toSet == Set("""{"v":1}""", """{"v":2}"""))
    assert(out.map(_.getMap[String, String](1)("hdfs_path")).toSet ==
      Set("/in/x.json", "/in/y.json"))
    Hdfs.drop(name)
  }

  test("OPEN of a missing file is a 404 RemoteException") {
    val name = fresh
    Hdfs.named(name)
    val resp = Hdfs.memClient(name)(Seq(graft.operators.Http.Request(
      s"mem://$name/webhdfs/v1/nope.txt?op=OPEN", "GET", Map.empty, ""))).head
    assert(resp.status == 404)
    assert(resp.body.contains("FileNotFoundException"))
    Hdfs.drop(name)
  }

  test("overwrite: CREATE on an existing path replaces the file") {
    val name = fresh
    val svc = Hdfs.named(name)
    Hdfs.write(Seq(("f.txt", "v1")).toDF("p", "value"), s"mem://$name",
      "/d", col("p"))
    Hdfs.write(Seq(("f.txt", "v2")).toDF("p", "value"), s"mem://$name",
      "/d", col("p"))
    assert(svc.files("/d/f.txt") == "v2")
    Hdfs.drop(name)
  }
}
