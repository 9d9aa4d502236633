package graft.functions

import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.{MmdbReader, MmdbWriter}

/** MaxMind DB reader against the public spec 2.0, via the test-fixture
  * writer: tree walk, longest-prefix semantics, data types, the
  * graft_geoip_lookup expression, and the bloblang geoip_* surface.
  */
class MmdbSpec extends SparkSpec {

  private val F = JsonNodeFactory.instance

  private def cityRec(name: String, iso: String, lat: Double) = {
    val o = F.objectNode()
    o.set[com.fasterxml.jackson.databind.JsonNode]("city",
      F.objectNode().set("names", F.objectNode().put("en", name)))
    o.set[com.fasterxml.jackson.databind.JsonNode]("country",
      F.objectNode().put("iso_code", iso))
    o.set[com.fasterxml.jackson.databind.JsonNode]("location",
      F.objectNode().put("latitude", lat))
    o
  }

  private lazy val dbPath: String = {
    val f = java.io.File.createTempFile("graft_test", ".mmdb")
    f.deleteOnExit()
    MmdbWriter.write(f.getPath, Seq(
      ("10.0.0.0", 8, cityRec("Tenton", "AA", 1.5)),
      ("10.1.0.0", 16, cityRec("Innerville", "BB", -2.25)),
      ("192.168.4.0", 24, cityRec("Subnet City", "CC", 48.0))))
    f.getPath
  }

  test("reader resolves prefixes of different lengths; misses are null") {
    val r = MmdbReader.cached(dbPath)
    assert(r.nodeCount > 0 && r.recordSize == 32 && r.ipVersion == 4)
    // the /16 is carved out of the /8 — longest prefix wins where
    // defined, the rest of the /8 still resolves to the /8 record
    assert(r.lookup("10.1.2.3").at("/city/names/en").asText == "Innerville")
    assert(r.lookup("10.200.0.1").at("/city/names/en").asText == "Tenton")
    assert(r.lookup("192.168.4.77").at("/country/iso_code").asText == "CC")
    assert(r.lookup("192.168.4.77").at("/location/latitude").asDouble == 48.0)
    assert(r.lookup("192.168.5.1") == null, "adjacent /24 must miss")
    assert(r.lookup("8.8.8.8") == null)
    assert(r.lookup("not-an-ip") == null)
  }

  test("graft_geoip_lookup expression enriches a column") {
    import spark.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    val out = Seq("10.1.2.3", "10.200.0.1", "8.8.8.8").toDF("ip")
      .select(get_json_object(
        call_function("graft_geoip_lookup", col("ip"), lit(dbPath)),
        "$.city.names.en").as("city"))
      .as[String].collect().toSeq
    assert(out == Seq("Innerville", "Tenton", null))
  }

  test("bloblang geoip_city method returns the record object") {
    import spark.implicits._
    val src =
      s"""root.city = this.ip.geoip_city("$dbPath").city.names.en
         |root.cc = this.ip.geoip_country("$dbPath").country.iso_code
         |""".stripMargin
    val df = Seq("""{"ip":"10.1.2.3"}""").toDF("value")
    val out = graft.blobl.Blobl.mapping(df, src, Map.empty)
      .select("value").as[String].head()
    assert(out == """{"cc":"BB","city":"Innerville"}""", out)
  }
}
