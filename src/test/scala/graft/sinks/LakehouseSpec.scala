package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iceberg-shaped lakehouse sink contract
  * (internal/impl/iceberg/output_iceberg.go): upsert by identifier
  * fields, delete row-operation, schema evolution, partitioned tables,
  * and the streaming foreachBatch form.
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private def drop(t: String): Unit = {
    Lakehouse.dropTable(spark, t)
    Lakehouse.dropTable(spark, t + "__stage")
  }

  test("first write creates the table; second upserts by key") {
    drop("lh_basic")
    Lakehouse.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "lh_basic", Seq("k"))
    Lakehouse.upsert(Seq((2L, "B"), (3L, "c")).toDF("k", "v"),
      "lh_basic", Seq("k"))
    val out = spark.table("lh_basic").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("schema evolution: new batch column added, old rows null") {
    drop("lh_evolve")
    Lakehouse.upsert(Seq((1L, "a")).toDF("k", "v"), "lh_evolve", Seq("k"))
    Lakehouse.upsert(Seq((2L, "b", 9.5)).toDF("k", "v", "score"),
      "lh_evolve", Seq("k"))
    val out = spark.table("lh_evolve").orderBy("k")
      .select($"k", $"v", $"score").collect()
    assert(out(0).getLong(0) == 1L && out(0).isNullAt(2),
      "pre-evolution row must read null for the added column")
    assert(out(1).getDouble(2) == 9.5)
    // table-only column survives a batch that lacks it
    Lakehouse.upsert(Seq((1L, "A")).toDF("k", "v"), "lh_evolve", Seq("k"))
    val r1 = spark.table("lh_evolve").filter($"k" === 1).head()
    assert(r1.getAs[String]("v") == "A" && r1.isNullAt(r1.fieldIndex("score")))
  }

  test("delete row-operation removes keys") {
    drop("lh_del")
    Lakehouse.upsert(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      "lh_del", Seq("k"))
    val batch = Seq((2L, "ignored", true), (3L, "C", false))
      .toDF("k", "v", "del")
    Lakehouse.upsert(batch, "lh_del", Seq("k"), deleteCol = Some("del"))
    val out = spark.table("lh_del").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (3L, "C")))
  }

  test("partitioned table round-trips through upsert") {
    drop("lh_part")
    val b1 = Seq((1L, "eu", 1.0), (2L, "us", 2.0)).toDF("k", "region", "x")
    Lakehouse.upsert(b1, "lh_part", Seq("k"), partitionCols = Seq("region"))
    Lakehouse.upsert(Seq((2L, "us", 2.5)).toDF("k", "region", "x"),
      "lh_part", Seq("k"), partitionCols = Seq("region"))
    val out = spark.table("lh_part").orderBy("k")
      .select($"k", $"x").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.0), (2L, 2.5)))
  }

  private def partFiles(table: String, part: String): Map[String, Long] = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(new java.io.File(warehouse, table), part)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("pruned merge does not rewrite untouched partitions' files") {
    drop("lh_prune")
    val b1 = Seq((1L, "eu", 1.0), (2L, "us", 2.0), (3L, "ap", 3.0))
      .toDF("k", "region", "x")
    Lakehouse.upsert(b1, "lh_prune", Seq("k"), partitionCols = Seq("region"))
    val usBefore = partFiles("lh_prune", "region=us")
    val apBefore = partFiles("lh_prune", "region=ap")
    assert(usBefore.nonEmpty && apBefore.nonEmpty)
    // touch only region=eu
    Lakehouse.upsert(Seq((1L, "eu", 1.5)).toDF("k", "region", "x"),
      "lh_prune", Seq("k"), partitionCols = Seq("region"))
    assert(partFiles("lh_prune", "region=us") == usBefore,
      "untouched partition us was rewritten")
    assert(partFiles("lh_prune", "region=ap") == apBefore,
      "untouched partition ap was rewritten")
    val out = spark.table("lh_prune").orderBy("k")
      .select($"k", $"x").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1.5), (2L, 2.0), (3L, 3.0)))
  }

  test("pruned merge follows a key that moves between partitions") {
    drop("lh_move")
    Lakehouse.upsert(
      Seq((1L, "eu", 1.0), (2L, "us", 2.0)).toDF("k", "region", "x"),
      "lh_move", Seq("k"), partitionCols = Seq("region"))
    // key 1 moves eu -> us: the old eu copy must not survive
    Lakehouse.upsert(Seq((1L, "us", 9.0)).toDF("k", "region", "x"),
      "lh_move", Seq("k"), partitionCols = Seq("region"))
    val out = spark.table("lh_move").orderBy("k")
      .select($"k", $"region", $"x").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "us", 9.0), (2L, "us", 2.0)))
    assert(spark.table("lh_move").filter($"region" === "eu").count() == 0)
  }

  test("pruned merge survives a batch with narrower numeric partition types") {
    drop("lh_widen")
    // table: part col LongType (from Long), keys include the part col
    Lakehouse.upsert(
      Seq((1L, 10L, 1.0), (2L, 20L, 2.0)).toDF("k", "bucket", "x"),
      "lh_widen", Seq("k", "bucket"), partitionCols = Seq("bucket"))
    // later batch supplies bucket as IntegerType — must cast, match the
    // existing partition, and NOT classify bucket=10 as emptied
    Lakehouse.upsert(
      Seq((1L, 10, 1.5)).toDF("k", "bucket", "x"),
      "lh_widen", Seq("k", "bucket"), partitionCols = Seq("bucket"))
    val out = spark.table("lh_widen").orderBy("k")
      .select($"k", $"bucket", $"x").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10L, 1.5), (2L, 20L, 2.0)),
      "type-widened batch must upsert in place, not drop the partition")
  }

  test("pruned merge drops a partition emptied by deletes") {
    drop("lh_empty")
    Lakehouse.upsert(
      Seq((1L, "eu", 1.0), (2L, "us", 2.0)).toDF("k", "region", "x"),
      "lh_empty", Seq("k"), partitionCols = Seq("region"))
    val del = Seq((1L, "eu", 0.0, true)).toDF("k", "region", "x", "del")
    Lakehouse.upsert(del, "lh_empty", Seq("k"),
      partitionCols = Seq("region"), deleteCol = Some("del"))
    val out = spark.table("lh_empty")
      .select($"k", $"region").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "us")))
  }

  test("config-runner lakehouse output upserts by key (idempotent)") {
    drop("lh_cfg")
    val config =
      """input:
        |  generate: { count: 5, mapping: 'root.k = this.seq' }
        |output:
        |  lakehouse: { table: lh_cfg, keys: [value] }
        |""".stripMargin
    graft.config.Pipeline.run(spark, config)
    assert(spark.table("lh_cfg").count() == 5)
    // re-running the same config MERGEs, not duplicates
    graft.config.Pipeline.run(spark, config)
    assert(spark.table("lh_cfg").count() == 5,
      "upsert output must be idempotent by key")
  }

  test("config-runner STREAMING lakehouse output merges micro-batches") {
    drop("lh_stream_cfg")
    val srcDir = java.nio.file.Files.createTempDirectory("lh_src").toString
    val ckDir = java.nio.file.Files.createTempDirectory("lh_ck2").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    val config =
      s"""input:
         |  file: { path: $srcDir, format: parquet, schema: 'k BIGINT, v STRING' }
         |output:
         |  lakehouse: { table: lh_stream_cfg, keys: [k], checkpoint: $ckDir }
         |""".stripMargin
    val q = graft.config.Pipeline.runStream(spark, config)
    try {
      q.processAllAvailable()
      Seq((2L, "B"), (3L, "c")).toDF("k", "v")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("lh_stream_cfg").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("streaming foreachBatch upsert applies each micro-batch") {
    drop("lh_stream")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("lh_ck").toString
    val q = Lakehouse.upsertStream(mem.toDF().toDF("k", "v"),
      "lh_stream", Seq("k"), dir)
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((2L, "B"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("lh_stream").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B")))
  }
}
