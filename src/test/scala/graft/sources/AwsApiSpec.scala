package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.AwsApi
import graft.sources.S3.Credentials

/** aws_lambda / aws_dynamodb_partiql / aws_sns contracts: signature
  * verification per request, function-error channel, AttributeValue
  * parameter binding, Query-API publish.
  */
class AwsApiSpec extends SparkSpec {
  import spark.implicits._

  private def fresh = "awst_" + java.util.UUID.randomUUID.toString.replace("-", "")
  private val creds = Credentials("AKIDT", "test-secret", "eu-west-1")

  private def envelope(values: String*) = values.toSeq.toDF("value")

  test("lambda: result replaces content; function errors hit the error channel") {
    val name = fresh
    val svc = AwsApi.registerLambda(name, creds, s => s"out:$s")
    val ok = AwsApi.lambdaProcessor(envelope("x").coalesce(1),
        s"mem://$name", creds, "fn")
      .select("value", "error").collect().head
    assert(ok.getString(0) == "out:x" && ok.isNullAt(1))
    val bad = AwsApi.lambdaProcessor(envelope("y").coalesce(1),
        s"mem://$name", creds, "fail-fn")
      .select("value", "error").collect().head
    assert(bad.getString(0) == "y", "payload unchanged on function error")
    assert(bad.getString(1).contains("function error"))
    assert(svc.invocations == 2 && svc.rejected == 0)
    AwsApi.drop(name)
  }

  test("lambda: a wrong secret is rejected by signature verification") {
    val name = fresh
    val svc = AwsApi.registerLambda(name, creds, identity)
    val out = AwsApi.lambdaProcessor(envelope("x").coalesce(1),
        s"mem://$name", creds.copy(secretKey = "wrong"), "fn")
      .select("error").as[String].collect().head
    assert(out.contains("403"))
    assert(svc.rejected == 1)
    AwsApi.drop(name)
  }

  test("partiql: positional params bind as typed AttributeValues") {
    val name = fresh
    val svc = AwsApi.registerDynamo(name, creds)
    val df = Seq(("k1", "v1")).toDF("k", "v").withColumn("value", lit(""))
      .coalesce(1)
    AwsApi.partiqlProcessor(df, s"mem://$name", creds,
      """INSERT INTO "t" VALUE {'k': ?, 'v': ?}""",
      Seq(col("k"), col("v"))).count()
    assert(svc.tables("t")("k1") == Map("k" -> "k1", "v" -> "v1"))
    val got = AwsApi.partiqlProcessor(df, s"mem://$name", creds,
        """SELECT * FROM "t" WHERE k = ?""", Seq(col("k")))
      .select("value").as[String].collect().head
    assert(got.contains(""""v":{"S":"v1"}"""))
    // a miss answers an empty Items array, not an error
    val miss = AwsApi.partiqlProcessor(
        Seq(("zz", "")).toDF("k", "v").withColumn("value", lit(""))
          .coalesce(1),
        s"mem://$name", creds,
        """SELECT * FROM "t" WHERE k = ?""", Seq(col("k")))
      .select("value").as[String].collect().head
    assert(miss == """{"Items":[]}""")
    AwsApi.drop(name)
  }

  test("sns: Query-API publish with signed form body") {
    val name = fresh
    val svc = AwsApi.registerSns(name, creds)
    AwsApi.snsWrite(envelope("m one", "m&two=x").coalesce(1),
      s"mem://$name", creds, "arn:aws:sns:eu-west-1:1:topic")
    assert(svc.rejected == 0)
    assert(svc.published.toSeq == Seq(
      ("arn:aws:sns:eu-west-1:1:topic", "m one"),
      ("arn:aws:sns:eu-west-1:1:topic", "m&two=x")))
    AwsApi.drop(name)
  }
}
