package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.expressions.GraftFunctions

/** Measurement harness for the r20 jaccard plan crossover: times the
  * co-occurrence COUNT plan and the df-ordered PREFIX plan on the same
  * corpus, prints the fan-out census (Σ df, Σ C(df,2), ratio) and both
  * plans' row counts + pair-set digests so equality is checked in the
  * same run. The committed crossover constant
  * ([[Dedupe.boilerplateHeavy]]) is justified by this tool's numbers.
  *
  * Usage: runMain graft.operators.JaccardLab <dir> <passes>
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object JaccardLab {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "16KB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = Spread.spread(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("id"), col("text").as("__txt")), col("id"))
    val sets = docs.select(col("id"),
      call_function("graft_shingle_hashes",
        tokens(col("__txt")), lit(3)).as("sh"))
    val ex = sets.withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
      .select(col("id"), col("sz"), explode(col("sh")).as("s"))

    val census = ex.groupBy(col("s"))
      .agg(count(lit(1)).cast("double").as("df"))
      .agg(sum(col("df")).as("n"),
        sum(col("df") * (col("df") - lit(1.0)) / 2.0).as("fanout"))
      .head()
    val n = census.getDouble(0)
    val fanout = census.getDouble(1)
    println(f"[jaccardlab] $dir index=${n}%.0f fanout=${fanout}%.0f " +
      f"ratio=${fanout / n}%.1f heavy=${Dedupe.boilerplateHeavy(ex)}")

    def digest(dfr: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = dfr.agg(count(lit(1)),
        coalesce(call_function("bit_xor",
          xxhash64(col("id_a"), col("id_b"), col("jaccard"))),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      Dedupe.countPairs(ex, 0.35).write.format("noop")
        .mode("overwrite").save()
      val t1 = System.nanoTime()
      Dedupe.prefixFilteredPairs(sets, ex, 0.35).write.format("noop")
        .mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[jaccardlab] pass $p count=${(t1 - t0) / 1e9}%.2f s " +
        f"prefix=${(t2 - t1) / 1e9}%.2f s")
    }
    val dc = digest(Dedupe.countPairs(ex, 0.35))
    val dp = digest(Dedupe.prefixFilteredPairs(sets, ex, 0.35))
    println(s"[jaccardlab] count rows/digest=$dc prefix rows/digest=$dp " +
      s"equal=${dc == dp}")
    spark.stop()
    sys.exit(0)
  }
}
