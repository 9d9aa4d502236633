package graft.config

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streams mode (inputs/inproc.adoc, outputs/inproc.adoc): multiple
  * named configs run in one session, chained by inproc ids, in
  * dependency order regardless of declaration order.
  */
class StreamsModeSpec extends SparkSpec {

  test("two streams chain through an inproc id") {
    val producer =
      """input:
        |  generate:
        |    count: 3
        |    mapping: 'root.n = this.seq + 1'
        |pipeline:
        |  processors:
        |    - mapping: 'root.tag = "s%v".format(this.n)'
        |output:
        |  inproc: bridge
        |""".stripMargin
    val consumer =
      """input:
        |  inproc: bridge
        |pipeline:
        |  processors:
        |    - mapping: 'root = this.tag.uppercase()'
        |output:
        |  drop: {}
        |""".stripMargin
    // consumer listed FIRST — the runner must order by the inproc edge
    val out = Pipeline.runStreams(spark,
      Seq("consumer" -> consumer, "producer" -> producer))
    assert(out.keySet == Set("producer", "consumer"))
    val got = out("consumer").select(col("value")).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(got == Seq("S1", "S2", "S3"))
  }

  test("cyclic inproc wiring is rejected") {
    val a =
      """input:
        |  inproc: loop_b
        |output:
        |  inproc: loop_a
        |""".stripMargin
    val b =
      """input:
        |  inproc: loop_a
        |output:
        |  inproc: loop_b
        |""".stripMargin
    val e = intercept[IllegalArgumentException] {
      Pipeline.runStreams(spark, Seq("a" -> a, "b" -> b))
    }
    assert(e.getMessage.contains("cyclic inproc wiring"))
  }
}
