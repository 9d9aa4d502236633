package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The last §2 family stragglers: sqlite buffer (durable acks),
  * json_documents scanner, aws_dynamodb cache, json_api /
  * aws_cloudwatch metrics targets, gcp_cloudtrace tracer, try_catch.
  */
class FamilyStragglersSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def uid() = java.util.UUID.randomUUID.toString.replace("-", "")

  test("sqlite buffer: rows persist until a successful output acks them") {
    val path = java.nio.file.Files.createTempDirectory("buf").toString + "/db"
    def config(out: String) =
      s"""input:
         |  generate: { count: 3, mapping: 'root.n = this.seq' }
         |buffer:
         |  sqlite: { path: "$path" }
         |output:
         |  $out
         |""".stripMargin
    // failing output: rows stay buffered
    intercept[Exception] {
      Pipeline.run(spark, config("""mongodb: { url: "tcp://unreachable", database: d, collection: c }"""))
    }
    assert(SqlBuffer.depth(path) == 3L, "undelivered rows survive")
    // successful run REPLAYS the stuck rows plus its own, then acks
    val view = "buf_out_" + uid()
    Pipeline.run(spark, config(s"memory: { name: $view }"))
    assert(spark.table(view).count() == 6L,
      "3 replayed + 3 fresh rows delivered")
    assert(SqlBuffer.depth(path) == 0L, "delivered rows acked away")
  }

  test("json_documents scanner splits concatenated documents") {
    val dir = java.nio.file.Files.createTempDirectory("jdocs")
    val raw = """{"a":1}{"b":"x{y}"} [1,2,3]
        |{"c":{"d":2}} "scalar" 42""".stripMargin.getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    java.nio.file.Files.write(dir.resolve("a.json.gz"), bos.toByteArray)
    val out = graft.sources.Sources.decompressFiles(spark,
      dir.toString + "/*.json.gz", "gzip", scanner = "json_documents")
    val got = out.select("value").collect().map(_.getString(0)).sorted
    assert(got.length == 6, got.toSeq.toString)
    assert(got.contains("""{"b":"x{y}"}"""), "braces inside strings ignored")
    assert(got.contains("[1,2,3]") && got.contains("42") &&
      got.contains("\"scalar\""))
  }

  test("aws_dynamodb cache backend hydrates via Scan") {
    val name = "ddbcache_" + uid()
    val creds = graft.sources.S3.Credentials("AKC", "SKC")
    val srv = graft.sources.DynamoCdc.register(name, creds)
    srv.seed("""{"S":"k1"}""", Map("key" -> "k1", "value" -> "v-one"))
    srv.seed("""{"S":"k2"}""", Map("key" -> "k2", "value" -> "v-two"))
    val out = Pipeline.build(spark,
      s"""input:
         |  generate: { count: 2, mapping: 'root.id = "k" + (this.seq + 1).string()' }
         |pipeline:
         |  processors:
         |    - cache: { resource: dc, operator: get, key: '$${! this.id }' }
         |cache_resources:
         |  - label: dc
         |    aws_dynamodb:
         |      endpoint: mem://$name
         |      table: t
         |      region: us-east-1
         |      credentials: { id: AKC, secret: SKC }
         |""".stripMargin)
    val got = out.select("value").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("v-one", "v-two"))
    graft.sources.DynamoCdc.drop(name)
  }

  test("gcp_cloud_storage / mongodb / sql / couchbase cache backends hydrate") {
    def runGet(cacheYaml: String, ids: Seq[String]): Seq[String] = {
      val mapping = ids.zipWithIndex
        .map { case (id, i) => s"""if this.seq == $i { root.id = "$id" }""" }
        .mkString("\n")
      Pipeline.build(spark,
        s"""input:
           |  generate:
           |    count: ${ids.size}
           |    mapping: |
           |${mapping.split("\n").map("      " + _).mkString("\n")}
           |pipeline:
           |  processors:
           |    - cache: { resource: cr, operator: get, key: '$${! this.id }' }
           |$cacheYaml
           |""".stripMargin)
        .select("value").collect().map(_.getString(0)).sorted.toSeq
    }
    // gcs
    val gcsName = "gcsc_" + uid()
    val gcs = graft.sources.Gcs.register(gcsName, "tok")
    new graft.sources.Gcs.Client(s"mem://$gcsName", "tok")
      .upload("bkt", "k1", "gcs-one".getBytes("UTF-8"))
    assert(runGet(
      s"""cache_resources:
         |  - label: cr
         |    gcp_cloud_storage: { endpoint: mem://$gcsName, token: tok, bucket: bkt }""".stripMargin,
      Seq("k1")) == Seq("gcs-one"))
    graft.sources.Gcs.drop(gcsName)
    // mongodb
    val moName = "moc_" + uid()
    graft.sources.Mongo.named(moName)
      .seed("db", "kv", Seq("""{"key":"a","value":"mongo-a"}"""))
    assert(runGet(
      s"""cache_resources:
         |  - label: cr
         |    mongodb: { url: mem://$moName, database: db, collection: kv }""".stripMargin,
      Seq("a")) == Seq("mongo-a"))
    graft.sources.Mongo.drop(moName)
    // sql (embedded Derby)
    val dbPath = java.nio.file.Files.createTempDirectory("sqlc").toString + "/db"
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:derby:$dbPath;create=true")
    val st = conn.createStatement()
    st.execute("""CREATE TABLE kv("key" VARCHAR(64), "value" VARCHAR(64))""")
    st.execute("""INSERT INTO kv VALUES('s1', 'sql-one')""")
    st.close(); conn.close()
    assert(runGet(
      s"""cache_resources:
         |  - label: cr
         |    sql:
         |      dsn: "jdbc:derby:$dbPath"
         |      table: kv
         |      key_column: "\\"key\\""
         |      value_column: "\\"value\\""""".stripMargin,
      Seq("s1")) == Seq("sql-one"))
    // couchbase (bounded init_keys sweep)
    val cbName = "cbc_" + uid()
    graft.sources.Couchbase.named(cbName)
    new graft.sources.Couchbase.Client(s"mem://$cbName")
      .upsert("c1", "cb-one")
    assert(runGet(
      s"""cache_resources:
         |  - label: cr
         |    couchbase: { url: mem://$cbName, init_keys: [ c1, missing ] }""".stripMargin,
      Seq("c1")) == Seq("cb-one"))
    graft.sources.Couchbase.drop(cbName)
    // redpanda compacted-topic cache: latest per key wins, tombstones delete
    val rpName = "rpc_" + uid()
    val broker = graft.sources.Broker.InMemory.named(rpName)
    broker.createTopic("kvcache", 1)
    def rec(k: String, v: String) = graft.sources.Broker.Record(
      k.getBytes("UTF-8"), if (v == null) null else v.getBytes("UTF-8"))
    broker.append("kvcache", 0, Seq(rec("r1", "old"), rec("r2", "keep"),
      rec("r1", "new"), rec("r3", "dead"), rec("r3", null)))
    assert(runGet(
      s"""cache_resources:
         |  - label: cr
         |    redpanda: { seed_brokers: [ mem://$rpName ], topic: kvcache }""".stripMargin,
      Seq("r1", "r2")) == Seq("keep", "new"),
      "latest value per key; tombstoned r3 would miss")
    graft.sources.Broker.InMemory.drop(rpName)
  }

  test("json_api metrics document and the aws_cloudwatch metrics target") {
    import graft.operators.MetricsExport
    val reg = new MetricsExport.Registry
    reg.counter("sent", Seq("out" -> "a")).addAndGet(5L)
    reg.gaugeSet("depth", 2.5)
    reg.timing("lat", 4000000L)
    val doc = mapper.readTree(MetricsExport.jsonApi(reg))
    assert(doc.get("sent{out=a}").asLong == 5L)
    assert(doc.get("depth").asDouble == 2.5)
    assert(doc.get("lat_count").asLong == 1L &&
      doc.get("lat_mean_ns").asLong == 4000000L)
    // cloudwatch metrics target through the run() flush
    val name = "cwm_" + uid()
    val creds = graft.sources.S3.Credentials("AK", "SK")
    val srv = graft.sources.CloudWatch.register(name, creds)
    Pipeline.run(spark,
      s"""input:
         |  generate: { count: 4, mapping: 'root.n = this.seq' }
         |metrics:
         |  aws_cloudwatch:
         |    endpoint: mem://$name
         |    namespace: GraftTest
         |    region: us-east-1
         |    credentials: { id: AK, secret: SK }
         |output:
         |  noop: {}
         |""".stripMargin)
    assert(srv.metrics.keys.exists(_._1 == "GraftTest"),
      s"cloudwatch datums expected: ${srv.metrics.keys.toSeq}")
    graft.sources.CloudWatch.drop(name)
  }

  test("gcp_cloudtrace tracer posts batchWrite spans") {
    val received = new java.util.concurrent.atomic.AtomicReference[String]()
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", ex => {
      received.set(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, 2)
      ex.getResponseBody.write("{}".getBytes)
      ex.close()
    })
    http.start()
    try {
      Pipeline.run(spark,
        s"""input:
           |  generate: { count: 1, mapping: 'root.n = this.seq' }
           |tracer:
           |  gcp_cloudtrace:
           |    url: http://127.0.0.1:${http.getAddress.getPort}
           |    project: my-proj
           |output:
           |  noop: {}
           |""".stripMargin)
      val body = mapper.readTree(received.get)
      val span = body.get("spans").get(0)
      assert(span.get("name").asText.startsWith("projects/my-proj/traces/"))
      assert(span.at("/displayName/value").asText == "pipeline.run")
      assert(span.at("/attributes/attributeMap/pipeline.output/stringValue/value")
        .asText == "noop")
    } finally http.stop(0)
  }
}
