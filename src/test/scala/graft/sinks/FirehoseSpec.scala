package graft.sinks

import graft.sources.S3.Credentials
import graft.SparkSpec

/** aws_kinesis_firehose output
  * (internal/impl/aws/kinesis/output_firehose.go): PutRecordBatch,
  * partial-failure retry of exactly the failed records, connect check.
  */
class FirehoseSpec extends SparkSpec {
  import spark.implicits._

  private val creds = Credentials("AKFH", "SKFH")

  test("delivers every record exactly once across injected throttles") {
    val name = "fh_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // every 5th fresh record's FIRST attempt is throttled — the client
    // must retry exactly those
    val srv = Firehose.register(name, creds, throttleEvery = 5)
    val df = (1 to 200).map(i => s"""{"i":$i}""").toDF("value")
    Firehose.write(df, s"mem://$name", creds, "deliveries", batchSize = 64)
    assert(srv.throttled > 0, "the throttle path must actually fire")
    assert(srv.delivered.size == 200, "no loss")
    assert(srv.delivered.distinct.size == 200, "no duplicates")
    assert(srv.delivered.map(s => s.drop(5).dropRight(1).toInt).sorted ==
      (1 to 200))
    Firehose.drop(name)
  }

  test("connect check fails fast on an unknown delivery stream state") {
    val name = "fh_" + java.util.UUID.randomUUID.toString.replace("-", "")
    Firehose.register(name, creds)
    // wrong credentials → DescribeDeliveryStream rejected at connect
    intercept[IllegalStateException] {
      Firehose.write(Seq("x").toDF("value"), s"mem://$name",
        Credentials("AKFH", "WRONG"), "deliveries")
    }
    Firehose.drop(name)
  }
}
