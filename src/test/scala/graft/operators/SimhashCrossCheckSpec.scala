package graft.operators

import org.apache.spark.sql.functions._
import sys.process._

import graft.{SparkSpec, Tables}

/** Independent cross-validation of the SimHash pair miner (the standing
  * oracle exemption t_simhash): scripts/simhash_check.py reimplements
  * XXH64 from the public xxHash spec plus the sign-vote fingerprint and
  * pigeonhole mining in pure python — zero shared code — and must
  * reproduce the engine's (id_a, id_b, hamming) triples value-for-value
  * over the sf0.1 corpus (525 pairs across 5000 docs at radius 3).
  * The md5-variant computation stays fully DuckDB-gated (t_simhash_md5).
  */
class SimhashCrossCheckSpec extends SparkSpec {

  test("simhash pairs match the independent python over the sf0.1 corpus") {
    val out = java.nio.file.Files.createTempDirectory("simhash_xc").toString
    Dedupe.simhashPairs(
        Tables.documents(spark, "/root/testdata/sf0.1"),
        "text", "doc_id", 3)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val cmd = Seq("python3", "scripts/simhash_check.py",
      "/root/testdata/sf0.1/documents.parquet", "3", out)
    val buf = new StringBuilder
    val code = cmd ! ProcessLogger(l => { buf.append(l).append('\n'); () })
    assert(code == 0, s"simhash_check.py mismatch:\n$buf")
    assert(buf.toString.contains("\"mismatches\": []"), buf.toString)
  }
}
