package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AI processor plumbing (chat batching, lexical rerank) and resource
  * ops (registry, cached compute).
  */
class AiResourcesSpec extends SparkSpec {

  test("chat completion batches and aligns outputs") {
    import spark.implicits._
    val df = (0 until 23).map(i => (i.toLong, s"prompt $i")).toDF("id", "prompt")
      .repartition(2)
    val out = Ai.chatCompletion(df, "prompt", "reply", 8,
        prompts => prompts.map(p => s"re:$p"))
      .select("id", "prompt", "reply").collect()
    assert(out.length == 23)
    out.foreach(r => assert(r.getString(2) == s"re:${r.getString(1)}"))
  }

  test("echo client is deterministic") {
    assert(Ai.echoClient(Seq("a", "b")) == Ai.echoClient(Seq("a", "b")))
  }

  test("lexical rerank orders by token overlap") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "red fish", "one red fish two"),
      (1L, "red fish", "completely unrelated words"),
      (1L, "red fish", "just red here"))
      .toDF("query_id", "query", "doc")
    val ranked = Ai.rerank(pairs, "query_id", "query", "doc", 3)
      .orderBy("rank").select("doc", "score").collect()
    assert(ranked(0).getString(0) == "one red fish two" &&
      ranked(0).getDouble(1) == 1.0)
    assert(ranked(1).getString(0) == "just red here" &&
      ranked(1).getDouble(1) == 0.5)
    assert(ranked(2).getDouble(1) == 0.0)
  }

  test("resource registry resolves and fails fast") {
    import spark.implicits._
    val reg = new Resources.Registry
    reg.register("double", df => df.withColumn("x", col("x") * 2))
    val out = reg.ref("double")(Seq(1, 2).toDF("x")).collect().map(_.getInt(0))
    assert(out.sorted.toSeq == Seq(2, 4))
    intercept[IllegalArgumentException](reg.ref("missing"))
  }

  test("cachedCompute invokes the computation once per distinct key") {
    import spark.implicits._
    val calls = spark.sparkContext.longAccumulator("calls")
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a")).toDF("id", "k")
    val out = Resources.cachedCompute(df, "k", keys =>
      keys.map { r => calls.add(1); (r.getString(0), r.getString(0).toUpperCase) }(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.STRING)).toDF("k", "ku"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("A", "A", "B", "A"))
    assert(calls.value == 2, s"computed ${calls.value} times for 2 distinct keys")
  }
}
