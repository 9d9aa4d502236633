package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.CosmosDb._

/** azure_cosmosdb contracts: master-key signing (verified
  * server-side), document lifecycle with partition keys, create
  * conflicts, parameterized SQL queries.
  */
class CosmosDbSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "cdbt_" + java.util.UUID.randomUUID.toString.replace("-", "")
  private val acct = Account(java.util.Base64.getEncoder
    .encodeToString("unit-test-master-key".getBytes("UTF-8")))

  test("master-key string-to-sign and the URL-encoded auth value") {
    val auth = MasterKey.sign(acct, "GET", "docs",
      "dbs/d/colls/c/docs/1", "thu, 27 apr 2017 00:51:12 gmt")
    assert(auth.startsWith("type%3Dmaster%26ver%3D1.0%26sig%3D"))
    // deterministic: same inputs → same signature
    assert(auth == MasterKey.sign(acct, "GET", "docs",
      "dbs/d/colls/c/docs/1", "thu, 27 apr 2017 00:51:12 gmt"))
    // verb case must not matter (signed lowercase)
    assert(auth == MasterKey.sign(acct, "get", "docs",
      "dbs/d/colls/c/docs/1", "thu, 27 apr 2017 00:51:12 gmt"))
  }

  test("wrong key is a 401; partition key isolates documents") {
    val name = fresh
    val svc = CosmosDb.register(name, acct)
    val good = new Client(s"mem://$name", acct, "d", "c")
    assert(good.create("pk1", """{"id":"1","v":"a"}""").status == 201)
    assert(good.create("pk2", """{"id":"1","v":"b"}""").status == 201,
      "same id under a different partition key is a distinct doc")
    assert(good.read("pk1", "1").body.contains("\"v\":\"a\""))
    assert(good.read("pk2", "1").body.contains("\"v\":\"b\""))
    val bad = new Client(s"mem://$name",
      Account(java.util.Base64.getEncoder.encodeToString(
        "wrong".getBytes)), "d", "c")
    assert(bad.read("pk1", "1").status == 401)
    assert(svc.rejected == 1)
    CosmosDb.drop(name)
  }

  test("create conflicts on existing id; upsert replaces; delete 204/404") {
    val name = fresh
    CosmosDb.register(name, acct)
    val c = new Client(s"mem://$name", acct, "d", "c")
    assert(c.create("p", """{"id":"1","v":1}""").status == 201)
    assert(c.create("p", """{"id":"1","v":2}""").status == 409)
    assert(c.create("p", """{"id":"1","v":3}""", upsert = true).status == 200)
    assert(c.read("p", "1").body.contains("\"v\":3"))
    assert(c.delete("p", "1").status == 204)
    assert(c.delete("p", "1").status == 404)
    assert(c.replace("p", "1", "{}").status == 404)
    CosmosDb.drop(name)
  }

  test("parameterized query filters by field; unbound params are 400") {
    val name = fresh
    CosmosDb.register(name, acct)
    val c = new Client(s"mem://$name", acct, "d", "c")
    c.create("p", """{"id":"1","lang":"en"}""")
    c.create("p", """{"id":"2","lang":"fr"}""")
    c.create("p", """{"id":"3","lang":"en"}""")
    val en = c.query("SELECT * FROM c WHERE c.lang = @l",
      Map("@l" -> "en"))
    assert(en.size == 2)
    assert(c.query("SELECT * FROM c", Map.empty).size == 3)
    val e = intercept[IllegalStateException] {
      c.query("SELECT * FROM c WHERE c.lang = @missing", Map.empty)
    }
    assert(e.getMessage.contains("400"))
    CosmosDb.drop(name)
  }

  test("processor: read replaces content, misses error per item") {
    val name = fresh
    CosmosDb.register(name, acct)
    val url = s"mem://$name"
    val docs = Seq(("p", "1", """{"id":"1","v":"x"}"""))
      .toDF("pk", "id", "value")
    CosmosDb.processor(docs, url, acct, "d", "c", "create",
      col("pk"), col("id")).count()
    val out = CosmosDb.processor(
        Seq(("p", "1", ""), ("p", "404", "")).toDF("pk", "id", "value"),
        url, acct, "d", "c", "read", col("pk"), col("id"))
      .select("id", "value", "error").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out("1")._1.contains("\"v\":\"x\"") && out("1")._2 == null)
    assert(out("404")._2.contains("404"))
    CosmosDb.drop(name)
  }
}
