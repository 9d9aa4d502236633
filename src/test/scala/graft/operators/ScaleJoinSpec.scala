package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Sinks

/** Scale mechanics: salted joins match unsalted results, and bucketed
  * table writes make downstream equi-joins exchange-free (the
  * co-location contract Sinks.table promises).
  */
class ScaleJoinSpec extends SparkSpec {

  test("salted join equals plain join on a hot-keyed dataset") {
    import spark.implicits._
    // one hot key carrying half the rows
    val skewed = ((1 to 500).map(i => ("hot", i)) ++
      (1 to 500).map(i => (s"k${i % 50}", i))).toDF("k", "v")
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).zipWithIndex
      .toDF("k", "tag")
    val plain = skewed.join(dim, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Joins.saltedJoin(skewed, dim, "k", salts = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join without an exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    // a previously failed run can leave the managed location behind
    Seq("bkt_a", "bkt_b").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "pa")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "pb")
    Sinks.table(a, "bkt_a", bucketBy = Some((8, Seq("id"))))
    Sinks.table(b, "bkt_b", bucketBy = Some((8, Seq("id"))))
    // force a sort-merge join so the bucketed layout (not a broadcast)
    // is what avoids the exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free, got:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
