import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Explain {
  def t[A](name: String)(f: => A): Unit = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s -> $r")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d)
    val sets = docs.select(col("doc_id").as("id"), tokens(col("text")).as("toks"))
      .select(col("id"), array_distinct(shinglesFromTokens(col("toks"), 3)).as("sh"))
    val inv = sets.withColumn("sz", size(col("sh")))
      .select(col("id"), col("sz"), explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("s"))
    t("inv")(inv.count())
    t("inv2")(inv.count())
    inv.explain("formatted")
    spark.stop()
  }
}
