package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedupe

/** Throwaway decomposition harness for the resolveClusters gate cost
  * (r15 brief item 2): times the mining collect with/without the
  * persist+count guard to locate the sf0.1 regression.
  */
object DecompClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("decomp").getOrCreate()
    import spark.implicits._

    def pairs() = Dedupe.minhashLshPairs(
      Tables.documents(spark, dir), "text", "doc_id", 3, 16, 4, 0.35)
      .select(col("id_a"), col("id_b"))

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[decomp] $label pass $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    time("bare-collect") {
      val n = pairs().as[(Long, Long)].collect().length
      require(n > 0)
    }
    time("persist-count-collect") {
      val raw = pairs().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = raw.count()
      val n = raw.as[(Long, Long)].collect().length
      raw.unpersist()
      require(c == n)
    }
    time("rdd-persist-count-collect") {
      val rdd = pairs().as[(Long, Long)].rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = rdd.count()
      val n = rdd.collect().length
      rdd.unpersist()
      require(c == n)
    }
    spark.stop()
  }
}
