package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{DynamoCdc, Mongo, SalesforceApi}
import graft.sources.S3.Credentials

/** Round-11 connector CONFIG forms: a user's YAML for the new
  * families must compile and run against the loopback services.
  */
class ConnectorConfigSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def uid() = java.util.UUID.randomUUID.toString.replace("-", "")

  test("mongodb_cdc input form: snapshot + stream from YAML") {
    val name = "ccfg_" + uid()
    val srv = Mongo.named(name)
    srv.seed("shop", "orders", Seq("""{"_id":1,"v":"seeded"}"""))
    val c = Mongo.clientFor(s"mem://$name", "shop")
    c.insert("orders", Seq(mapper.readTree("""{"_id":2,"v":"streamed"}""")))
    c.close()
    val out = Pipeline.build(spark,
      s"""input:
         |  mongodb_cdc:
         |    url: mem://$name
         |    database: shop
         |    collections: [ orders ]
         |    snapshot_parallelism: 2
         |""".stripMargin)
    // the workload ran before the stream opened ("now" semantics), so
    // both documents arrive via the parallel snapshot
    val ops = out.select("operation").collect().map(_.getString(0))
    assert(ops.length == 2 && ops.forall(_ == "read"), ops.toSeq.toString)
    Mongo.drop(name)
  }

  test("aws_dynamodb_cdc input form with credentials block") {
    val name = "ccfg_" + uid()
    val srv = DynamoCdc.register(name, Credentials("AKX", "SKX"))
    srv.seed("""{"N":"1"}""", Map("k" -> 1L, "v" -> "a"))
    val out = Pipeline.build(spark,
      s"""input:
         |  aws_dynamodb_cdc:
         |    endpoint: mem://$name
         |    table: t
         |    region: us-east-1
         |    credentials: { id: AKX, secret: SKX }
         |""".stripMargin)
    assert(out.count() == 1L)
    DynamoCdc.drop(name)
  }

  test("salesforce_graphql input form paginates from YAML") {
    val name = "ccfg_" + uid()
    val srv = SalesforceApi.register(name, "cid", "cs", pageSize = 3)
    srv.seedGraph("Doc__c", (1 to 8).map(i => s"""{"Id":"x$i"}"""))
    val out = Pipeline.build(spark,
      s"""input:
         |  salesforce_graphql:
         |    org_url: mem://$name
         |    client_id: cid
         |    client_secret: cs
         |    query: 'query { uiapi { query { Doc__c { edges { node { Id { value } } } pageInfo { hasNextPage endCursor } } } } }'
         |""".stripMargin)
    assert(out.count() == 8L)
    SalesforceApi.drop(name)
  }

  test("iceberg output form commits a real readable table") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("cfg_iceberg").toString
    Pipeline.run(spark,
      s"""input:
         |  generate:
         |    count: 5
         |    mapping: |
         |      root.k = this.seq
         |      root.v = "row"
         |output:
         |  iceberg:
         |    location: $loc
         |    schema: "k LONG, v STRING"
         |""".stripMargin)
    val got = graft.sinks.Iceberg.readTable(spark, loc)
      .select("k").as[Long].collect().sorted
    assert(got.toSeq == (0L until 5L))
  }

  test("dynamic input unions enabled children; toggles apply on rebuild") {
    val prefix = "dyn_" + uid()
    def build() = Pipeline.build(spark,
      s"""input:
         |  dynamic:
         |    prefix: $prefix
         |    inputs:
         |      a:
         |        generate: { count: 3, mapping: 'root.src = "a"' }
         |      b:
         |        generate: { count: 2, mapping: 'root.src = "b"' }
         |""".stripMargin)
    assert(build().count() == 5L)
    val tagged = build().select(element_at(col("metadata"), "dynamic_input"))
      .collect().map(_.getString(0)).sorted
    assert(tagged.toSeq == Seq("a", "a", "a", "b", "b"))
    Pipeline.Dynamic.disable(prefix, "b")
    assert(build().count() == 3L, "disabled child dropped on rebuild")
    Pipeline.Dynamic.enable(prefix, "b")
    assert(build().count() == 5L)
  }

  test("snowflake_put output form loads the private_key_file PEM") {
    val kp = graft.sinks.SnowflakePut.generateKeyPair()
    val pemFile = java.nio.file.Files.createTempFile("sf_key", ".p8")
    java.nio.file.Files.write(pemFile,
      graft.sinks.SnowflakePut.privateKeyPem(kp).getBytes("UTF-8"))
    // round-trip sanity: PEM → KeyPair signs tokens the original
    // public key verifies
    val restored = graft.sinks.SnowflakePut.keyPairFromPem(
      new String(java.nio.file.Files.readAllBytes(pemFile), "UTF-8"))
    val tok = graft.sinks.SnowflakePut.Jwt.issue("acct", "u", restored)
    assert(graft.sinks.SnowflakePut.Jwt.verify(tok, kp.getPublic,
      "acct", "u").isRight)
    val name = "ccfg_" + uid()
    val srv = graft.sinks.SnowflakePut.register(name, "acct", "loader",
      kp.getPublic)
    Pipeline.run(spark,
      s"""input:
         |  generate: { count: 4, mapping: 'root.n = this.seq' }
         |output:
         |  snowflake_put:
         |    endpoint: mem://$name
         |    account: acct
         |    user: loader
         |    private_key_file: ${pemFile}
         |    stage: st
         |    path: p
         |    compression: NONE
         |""".stripMargin)
    assert(srv.rows("st").size == 4)
    graft.sinks.SnowflakePut.drop(name)
  }

  test("kafka input/output forms run over the kafka:// WIRE transport") {
    import graft.sources.{Broker, KafkaWire}
    val srv = new KafkaWire.Server()
    val hostPort = s"127.0.0.1:${srv.port}"
    val addr = s"kafka://$hostPort"
    try {
      Broker.transportFor(addr).createTopic("cfg", 2)
      // output form: produce through real Produce frames
      Pipeline.run(spark,
        s"""input:
           |  generate: { count: 20, mapping: 'root.id = this.seq' }
           |pipeline:
           |  processors:
           |    - mapping: 'root.id = this.id'
           |output:
           |  kafka:
           |    seed_brokers: [ $addr ]
           |    topic: cfg
           |    key: "k"
           |""".stripMargin)
      // input form: read back through real Fetch frames
      val out = Pipeline.build(spark,
        s"""input:
           |  kafka:
           |    seed_brokers: [ $addr ]
           |    topics: [ cfg ]
           |""".stripMargin)
      val ids = out.select(
          get_json_object(col("value"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (0L until 20L), s"wire roundtrip via YAML: $ids")
    } finally {
      KafkaWire.dropClient(hostPort)
      srv.stop()
    }
  }
}
