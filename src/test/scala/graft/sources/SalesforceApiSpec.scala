package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** salesforce_graphql input + salesforce output
  * (input_salesforce_graphql.go, output_salesforce.go).
  */
class SalesforceApiSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def newServer(pageSize: Int = 50): (String, SalesforceApi.Server) = {
    val name = "sfapi_" + java.util.UUID.randomUUID.toString.replace("-", "")
    (name, SalesforceApi.register(name, "cid", "csecret", pageSize))
  }

  test("graphql paginates via injected after cursors; nodes flatten") {
    val (name, srv) = newServer(pageSize = 7)
    srv.seedGraph("Account", (1 to 20).map(i =>
      s"""{"Id":"a$i","Name":"acct $i","Rank":$i}"""))
    val query =
      """query Accounts { uiapi { query { Account(first: 7) {
        |edges { node { Id { value } Name { value } Rank { value } } }
        |pageInfo { hasNextPage endCursor } } } } }""".stripMargin
    val out = SalesforceApi.graphqlRead(spark, s"mem://$name", "cid",
      "csecret", query)
    val got = out.select("value").as[String].collect()
      .map(mapper.readTree)
    assert(got.length == 20, "3 pages of 7 walked to exhaustion")
    assert(got.map(_.get("Rank").asInt).sorted.toSeq == (1 to 20))
    assert(got.head.get("Name").asText.startsWith("acct "),
      "field {value} wrappers flattened")
    SalesforceApi.drop(name)
  }

  test("injectAfter rewrites existing args and replaces stale cursors") {
    val q1 = "query { uiapi { query { Account(first: 5) { edges } } } }"
    val r1 = SalesforceApi.injectAfter(q1, "Account", "cur-5")
    assert(r1.contains("""Account(first: 5, after: "cur-5")"""))
    val r2 = SalesforceApi.injectAfter(r1, "Account", "cur-10")
    assert(r2.contains("""after: "cur-10"""") && !r2.contains("cur-5"))
    val q3 = "query { uiapi { query { Account { edges } } } }"
    assert(SalesforceApi.injectAfter(q3, "Account", "c")
      .contains("""Account(after: "c")"""))
  }

  test("realtime upsert/delete through composite sobjects") {
    val (name, srv) = newServer()
    val df = (1 to 25).map(i => s"""{"Ext__c":"e$i","Amount":$i}""")
      .toDF("value")
    SalesforceApi.write(df, s"mem://$name", "cid", "csecret",
      "Order__c", operation = "upsert", externalIdField = "Ext__c",
      mode = "realtime", batchSize = 10)
    assert(srv.store("Order__c").size == 25)
    assert(srv.store("Order__c")("e7").get("Amount").asInt == 7)
    // delete half
    SalesforceApi.write((1 to 25).filter(_ % 2 == 0)
        .map(i => s"""{"Ext__c":"e$i"}""").toDF("value"),
      s"mem://$name", "cid", "csecret", "Order__c",
      operation = "delete", externalIdField = "Ext__c")
    assert(srv.store("Order__c").keySet.forall(k =>
      k.stripPrefix("e").toInt % 2 == 1))
    SalesforceApi.drop(name)
  }

  test("bulk mode runs the full ingest lifecycle with CSV payloads") {
    val (name, srv) = newServer()
    val df = (1 to 30).map(i =>
      s"""{"Ext__c":"b$i","Name":"row, $i","Amount":$i}""").toDF("value")
    SalesforceApi.write(df, s"mem://$name", "cid", "csecret",
      "Order__c", operation = "upsert", externalIdField = "Ext__c",
      mode = "bulk", batchSize = 12)
    assert(srv.store("Order__c").size == 30)
    // the quoted comma survived the CSV round trip
    assert(srv.store("Order__c")("b3").get("Name").asText == "row, 3")
    SalesforceApi.drop(name)
  }

  test("bulk CSV round-trips quoted newlines and embedded quotes") {
    val (name, srv) = newServer()
    val df = Seq(
      """{"Ext__c":"n1","Name":"line one\nline two"}""",
      """{"Ext__c":"n2","Name":"say \"hi\", ok?"}""").toDF("value")
    SalesforceApi.write(df, s"mem://$name", "cid", "csecret",
      "Order__c", operation = "upsert", externalIdField = "Ext__c",
      mode = "bulk")
    assert(srv.store("Order__c").size == 2)
    assert(srv.store("Order__c")("n1").get("Name").asText ==
      "line one\nline two", "quoted newline must not split the record")
    assert(srv.store("Order__c")("n2").get("Name").asText ==
      """say "hi", ok?""")
    SalesforceApi.drop(name)
  }

  test("wrong client secret is rejected at token exchange") {
    val (name, srv) = newServer()
    intercept[IllegalStateException] {
      SalesforceApi.graphqlRead(spark, s"mem://$name", "cid", "WRONG",
        "query { uiapi { query { X { edges } } } }")
    }
    assert(srv.rejected > 0)
  }

}
