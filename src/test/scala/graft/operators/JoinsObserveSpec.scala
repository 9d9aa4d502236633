package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Enrichment joins against the reference's documented examples, and
  * the observability surface (metric/crash/log).
  */
class JoinsObserveSpec extends SparkSpec {

  // the EXACT hobbies example from docs/…/inputs/sequence.adoc:94-133
  test("sharded_join full-outer + array merge matches the documented example") {
    import spark.implicits._
    val main = Seq(("AAA", "Melanie", 34), ("BBB", "Emma", 28), ("CCC", "Geri", 45))
      .toDF("uuid", "name", "age")
    val hobbies = Seq(("CCC", "pokemon go"), ("AAA", "rowing"), ("AAA", "golf"))
      .toDF("uuid", "hobby")
    val out = Joins.shardedJoin(Seq(main, hobbies), "uuid",
        joinType = "full-outer", mergeStrategy = "array")
      .orderBy("uuid").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("AAA", "BBB", "CCC"))
    assert(out(0).getString(1) == "Melanie" && out(0).getInt(2) == 34)
    assert(out(0).getSeq[String](3) == Seq("golf", "rowing"),
      "AAA's hobbies gather into a sorted array")
    assert(out(1).isNullAt(3), "BBB has no hobbies row")
    assert(out(2).getSeq[String](3) == Seq("pokemon go"),
      "single hobby still an array — the field repeats in its input")
  }

  test("sharded_join outer keeps only ids present in the last input") {
    import spark.implicits._
    val a = Seq(("x", 1), ("y", 2)).toDF("id", "va")
    val b = Seq(("y", 10), ("z", 20)).toDF("id", "vb")
    val out = Joins.shardedJoin(Seq(a, b), "id",
        joinType = "outer", mergeStrategy = "replace")
      .orderBy("id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("y", "z"))
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 10)
  }

  test("hydration join broadcasts the cache side") {
    import spark.implicits._
    val stream = Seq((1L, "a"), (2L, "b"), (9L, "miss")).toDF("k", "payload")
    val cache = Seq((1L, "one"), (2L, "two")).toDF("k", "hydrated")
    val out = Joins.hydrationJoin(stream, cache, "k")
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "cache side must broadcast")
    val rows = out.orderBy("k").collect()
    assert(rows(2).isNullAt(2), "cache miss keeps the row with null")
  }

  test("observe metric computes inside the plan") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    val (flowing, obs) = Observe.metric(df, "m",
      Seq(count(lit(1)).as("rows"), sum(col("x")).as("total")))
    assert(flowing.count() == 100)
    val m = obs.get
    assert(m("rows") == 100L && m("total") == 5050L)
  }

  test("crashOn aborts on the first matching row, passes otherwise") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(Observe.crashOn(df, col("x") > 99, "too big").count() == 3)
    val e = intercept[Exception] {
      Observe.crashOn(df, col("x") > 2, "too big").count()
    }
    assert(e.getMessage.contains("too big") ||
      Option(e.getCause).exists(_.getMessage.contains("too big")))
  }

  test("logSample passes rows through unchanged") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    val out = Observe.logSample(df, every = 2, prefix = "t")
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("tracer captures action spans with observed stage metrics") {
    import spark.implicits._
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = Observe.attachTracer(spark, spans.add(_))
    try {
      def hit(): Boolean = spans.toArray(Array.empty[String]).exists(s =>
        s.contains("\"span\":") && s.contains("stage1") &&
          s.contains("\"rows\":50"))
      // listener delivery is async (and can lag under full-suite bus
      // load) — re-run the action until a span lands
      var attempt = 0
      while (!hit() && attempt < 5) {
        val df = (1 to 50).toDF("x")
        val (flowing, _) = Observe.metric(df, "stage1",
          Seq(count(lit(1)).as("rows")))
        flowing.write.format("noop").mode("overwrite").save()
        val deadline = System.currentTimeMillis + 6000
        while (!hit() && System.currentTimeMillis < deadline)
          Thread.sleep(100)
        attempt += 1
      }
      assert(hit(),
        s"no span carried the stage metric: ${spans.toArray.toSeq.take(3)}")
    } finally spark.listenerManager.unregister(l)
  }
}
