package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JDBC source/sink end-to-end against an EMBEDDED Derby database (the
  * derby jars ship with Spark, so the reference's sql_select input /
  * sql_insert output contract is testable without external services):
  * partitioned parallel reads, predicate pushdown into the remote
  * query, and the partition-parallel writer.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (id BIGINT NOT NULL, name VARCHAR(64), score DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setLong(1, i); ins.setString(2, s"name_$i"); ins.setDouble(3, i * 0.5)
      ins.executeUpdate()
    }
    ins.close(); st.close(); conn.close()
    u
  }

  test("partitioned parallel read returns every row exactly once") {
    val df = Sources.jdbc(spark, url, "people",
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 101,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4,
      "partitionColumn must split the scan into range-bounded queries")
    val rows = df.select($"id", $"name").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(rows.length == 100)
    assert(rows.head == (1L, "name_1") && rows.last == (100L, "name_100"))
  }

  test("filters push down into the remote JDBC query") {
    val df = Sources.jdbc(spark, url, "people").filter($"id" <= 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(ID,10)"),
      s"filter must reach the JDBC scan:\n$plan")
    assert(df.count() == 10)
  }

  test("jdbc sink writes partition-parallel and reads back") {
    val out = (1 to 20).map(i => (i.toLong, s"w$i")).toDF("id", "name")
      .repartition(4)
    graft.sinks.Sinks.jdbc(out, url, "written")
    val back = Sources.jdbc(spark, url, "written")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.length == 20 && back.head == (1L, "w1"))
  }

  test("config-runner sql_select enriches from the JDBC table") {
    val config =
      s"""input:
         |  generate: { count: 3, mapping: 'root.id = this.seq + 1' }
         |pipeline:
         |  processors:
         |    - sql_select:
         |        url: $url
         |        table: people
         |        key_column: ID
         |        key: '$${! this.id }'
         |        columns: [NAME]
         |""".stripMargin
    val out = graft.config.Pipeline.build(spark, config)
      .select($"value").as[String].collect().toSeq.sorted
    assert(out.forall(_.contains(""""NAME":"name_""")), s"no enrichment: $out")
  }

  test("config-runner sql_insert writes rows as they flow, pass-through") {
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE inserted (id BIGINT, tag VARCHAR(32))")
    conn.close()
    val config =
      s"""input:
         |  generate: { count: 7, mapping: 'root.id = this.seq
         |root.tag = "t" + this.seq.string()' }
         |pipeline:
         |  processors:
         |    - sql_insert:
         |        url: $url
         |        table: inserted
         |        columns: [id, tag]
         |""".stripMargin
    val flowed = graft.config.Pipeline.build(spark, config).count()
    assert(flowed == 7, "messages must pass through unchanged")
    val back = Sources.jdbc(spark, url, "inserted")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.length == 7 && back.head == (0L, "t0") && back.last == (6L, "t6"))
  }

  test("sql_insert errors malformed rows and does not replay on re-action") {
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE inserted2 (id BIGINT, tag VARCHAR(32))")
    conn.close()
    val in = Seq("""{"id":1,"tag":"ok"}""", """not json at all""")
      .toDF("value")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val proc = mapper.readTree(
      s"""sql_insert:
         |  url: $url
         |  table: inserted2
         |  columns: [id, tag]
         |""".stripMargin)
    val compiled = graft.config.Processors.compile(proc, Map.empty)(in)
    // TWO actions on the result: without the barrier the inserts would
    // run twice and duplicate rows
    val rows = compiled.select($"value", $"error").collect().sortBy(_.getString(0))
    assert(compiled.count() == 2)
    assert(rows.length == 2)
    val (bad, good) = (rows.head, rows.last)
    assert(good.getString(1) == null, "well-formed row must not error")
    assert(bad.getString(0) == "not json at all" &&
      bad.getString(1) != null && bad.getString(1).startsWith("sql_insert:"),
      "malformed value must error the row, not the task")
    val back = Sources.jdbc(spark, url, "inserted2")
      .as[(Long, String)].collect()
    assert(back.toSeq == Seq((1L, "ok")),
      "exactly one insert: errored row skipped, no replay on second action")
  }

  test("sql_select-shaped enrichment joins a JDBC table") {
    // the reference's sql_select processor = lookup against a DB table;
    // relational form: broadcast join against the JDBC scan
    val stream = Seq((5L, "a"), (50L, "b"), (999L, "miss")).toDF("id", "tag")
    val dim = Sources.jdbc(spark, url, "people").select($"id", $"name")
    val joined = stream.join(broadcast(dim), Seq("id"), "left_outer")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(joined == Seq((5L, "a", "name_5"), (50L, "b", "name_50"),
      (999L, "miss", null)))
  }
}
