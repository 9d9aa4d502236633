package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract tests for the `salesforce` input against
  * [[Salesforce.InMemoryServer]]: SOQL composition + placeholder
  * escaping, the client-credentials exchange, nextRecordsUrl
  * pagination, the 401 token-refresh path, and the config-runner form.
  */
class SalesforceSpec extends SparkSpec {
  import Salesforce.InMemoryServer._

  private def accounts(n: Int): Seq[Record] =
    (0 until n).map(i => Record(Seq(
      "Id" -> f"001$i%04d", "Name" -> s"Acme $i", "Score__c" -> i.toLong)))

  test("SOQL composition and literal escaping") {
    assert(Salesforce.buildSoql("Account", Seq("Id", "Name")) ==
      "SELECT Id, Name FROM Account")
    assert(Salesforce.buildSoql("Account", Seq("Id"),
      where = "Name = ? AND Score__c > ?", args = Seq("O'Brien \\ Co", 5L),
      suffix = "ORDER BY Id") ==
      """SELECT Id FROM Account WHERE Name = 'O\'Brien \\ Co' AND Score__c > 5 ORDER BY Id""")
    // ? inside a quoted literal is not a placeholder
    assert(Salesforce.buildSoql("A", Seq("Id"),
      where = "Name = 'what?' AND X = ?", args = Seq(true)) ==
      "SELECT Id FROM A WHERE Name = 'what?' AND X = true")
    // timestamps render ISO-8601 unquoted; null → null
    val t = java.sql.Timestamp.from(
      java.time.Instant.parse("2026-01-02T03:04:05Z"))
    assert(Salesforce.substitutePlaceholders("M > ? AND N = ?",
      Seq(t, null)) == "M > 2026-01-02T03:04:05Z AND N = null")
    // arg/placeholder count mismatches fail fast
    intercept[IllegalArgumentException] {
      Salesforce.buildSoql("A", Seq("Id"), where = "X = ?")
    }
    intercept[IllegalArgumentException] {
      Salesforce.buildSoql("A", Seq("Id"), args = Seq(1))
    }
  }

  test("extract walks every nextRecordsUrl page with metadata") {
    val t = Transport("Account", accounts(7), pageSize = 3)
    val df = Salesforce.read(spark, "mem://x", "cid", "csec", "Account",
      Seq("Id", "Name", "Score__c"), suffix = "ORDER BY Id", client = t)
    val rows = df.orderBy("__seq").collect()
    assert(rows.length == 7)
    assert(t.tokenExchanges == 1, "one exchange serves the whole walk")
    val ids = rows.map(r => new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(r.getString(0)).path("Id").asText())
    assert(ids.toSeq == (0 until 7).map(i => f"001$i%04d"))
    val m = rows.head.getMap[String, String](1)
    assert(m("sobject") == "Account" && m("total_size") == "7")
    assert(m("soql") ==
      "SELECT Id, Name, Score__c FROM Account ORDER BY Id")
    // records carry the attributes envelope like the real API
    assert(rows.head.getString(0).contains(""""attributes":{"type":"Account""""))
  }

  test("WHERE placeholder filters server-side") {
    val t = Transport("Account", accounts(10))
    val got = Salesforce.read(spark, "mem://x", "cid", "csec", "Account",
        Seq("Id", "Score__c"), where = "Score__c > ?", args = Seq(6L),
        suffix = "ORDER BY Id", client = t)
      .select(get_json_object(col("value"), "$.Score__c")).collect()
      .map(_.getString(0).toLong).toSet
    assert(got == Set(7L, 8L, 9L))
  }

  test("a 401 mid-walk refreshes the token once and resumes") {
    // token expires server-side after the 2nd query call: page 3 401s,
    // the client re-exchanges and retries the same page
    val t = Transport("Account", accounts(9), pageSize = 3,
      expireTokenAfterQueries = 2)
    val rows = Salesforce.read(spark, "mem://x", "cid", "csec", "Account",
      Seq("Id"), suffix = "ORDER BY Id", client = t).collect()
    assert(rows.length == 9, "every page delivered despite the expiry")
    assert(t.tokenExchanges == 2, "exactly one refresh")
  }

  test("config runner form reads through a registered mem:// client") {
    val name = "sf_" + java.util.UUID.randomUUID.toString.take(8)
    Salesforce.registerClient(name, Transport("Contact",
      (0 until 4).map(i => Record(Seq("Id" -> s"003$i", "N__c" -> i.toLong)))))
    val df = graft.config.Pipeline.run(spark,
      s"""input:
         |  salesforce:
         |    org_url: mem://$name
         |    client_id: cid
         |    client_secret: csec
         |    object: Contact
         |    columns: [Id, N__c]
         |    where: "N__c > ?"
         |    args: [0]
         |    suffix: ORDER BY Id
         |pipeline:
         |  processors: []
         |""".stripMargin)
    assert(df.count() == 3)
    assert(df.selectExpr("metadata['sobject']").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("Contact"))
  }
}
