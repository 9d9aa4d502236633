package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Http
import graft.sources.AwsApi
import graft.sources.S3.Credentials

/** `aws_kinesis_firehose` output (reference
  * internal/impl/aws/kinesis/output_firehose.go — contract only, the
  * reference rides the SDK): DescribeDeliveryStream on connect, then
  * PutRecordBatch over the public Firehose_20150804 JSON 1.1 protocol
  * with base64 Data, and the reference's PARTIAL-FAILURE semantics
  * (output_firehose.go:185-245): when `FailedPutCount` > 0, exactly
  * the failed records are retried with backoff until delivered or
  * attempts expire — successes are never re-sent (no duplicates).
  *
  * Scale shape: one connection per partition, batches of ≤500 (the
  * API limit), retries inside the task. SigV4-signed; the loopback
  * re-derives signatures and can inject throttles to prove the
  * partial-retry path.
  */
object Firehose {

  private def mapper = new ObjectMapper()

  def write(df: DataFrame, endpoint: String, creds: Credentials,
            streamName: String, valueCol: String = "value",
            batchSize: Int = 500, maxRetries: Int = 5,
            retryBaseMs: Long = 10, client: Http.Client = null): Unit = {
    require(batchSize >= 1 && batchSize <= 500,
      "PutRecordBatch accepts at most 500 records")
    // connect check (output_firehose.go:158)
    val c0 = Option(client).getOrElse(resolveClient(endpoint))
    val desc = call(c0, endpoint, creds,
      "Firehose_20150804.DescribeDeliveryStream",
      s"""{"DeliveryStreamName":"$streamName"}""")
    require(desc.at("/DeliveryStreamDescription/DeliveryStreamStatus")
      .asText == "ACTIVE", s"delivery stream $streamName not active")
    val (e, cr, sn) = (endpoint, creds, streamName)
    val clientV = client
    df.select(col(valueCol).cast("string")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val c = Option(clientV).getOrElse(resolveClient(e))
        it.grouped(batchSize).foreach { rows =>
          var pending = rows.map(_.getString(0)).toVector
          var attempt = 0
          while (pending.nonEmpty) {
            val body = mapper.createObjectNode()
            body.put("DeliveryStreamName", sn)
            val recs = body.putArray("Records")
            pending.foreach { v =>
              recs.addObject().put("Data",
                java.util.Base64.getEncoder.encodeToString(v.getBytes(UTF_8)))
              ()
            }
            val r = call(c, e, cr, "Firehose_20150804.PutRecordBatch",
              body.toString)
            val failed = r.path("RequestResponses").elements().asScala
              .zipWithIndex
              .collect { case (resp, i) if resp.has("ErrorCode") => i }
              .toSet
            pending =
              if (r.path("FailedPutCount").asInt(0) == 0) Vector.empty
              else pending.zipWithIndex.collect {
                case (v, i) if failed(i) => v
              }
            if (pending.nonEmpty) {
              attempt += 1
              if (attempt > maxRetries) throw new IllegalStateException(
                s"firehose: ${pending.size} records still failing " +
                  s"after $maxRetries retries")
              Thread.sleep(retryBaseMs << math.min(attempt, 6))
            }
          }
        }
    }
  }

  private def call(c: Http.Client, endpoint: String, creds: Credentials,
                   target: String, body: String): JsonNode = {
    val r = AwsApi.signedPost(c, endpoint, creds, "firehose", "/", body,
      Map("X-Amz-Target" -> target,
        "Content-Type" -> "application/x-amz-json-1.1"))
    if (r.status / 100 != 2)
      throw new IllegalStateException(s"$target -> ${r.status}: ${r.body}")
    mapper.readTree(r.body)
  }

  /** Loopback Firehose: SigV4-verified; `throttleEvery` > 0 rejects
    * every Nth NEW record's first attempt with a throttling error so
    * the partial-retry path is exercised — a record is only stored on
    * the attempt that succeeds, so duplicates would be visible.
    */
  final class MemFirehose(creds: Credentials, throttleEvery: Int = 0) {
    private val m = new ObjectMapper()
    val delivered: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
    private val attempted = mutable.Set[String]()
    private val counter = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var rejected = 0
    @volatile var throttled = 0

    def handle(q: Http.Request): Http.Response = synchronized {
      AwsApi.verifySig(q, creds, "firehose") match {
        case Some(_) =>
          rejected += 1
          return Http.Response(403, """{"__type":"AccessDenied"}""")
        case None => ()
      }
      val target = q.headers.getOrElse("X-Amz-Target", "")
      val body = m.readTree(q.body)
      target.split("\\.").last match {
        case "DescribeDeliveryStream" =>
          Http.Response(200,
            s"""{"DeliveryStreamDescription":{"DeliveryStreamName":${m.writeValueAsString(
              body.path("DeliveryStreamName").asText)},"DeliveryStreamStatus":"ACTIVE"}}""")
        case "PutRecordBatch" =>
          val o = m.createObjectNode()
          val resps = o.putArray("RequestResponses")
          var failedCount = 0
          body.path("Records").elements().asScala.foreach { rec =>
            val data = new String(java.util.Base64.getDecoder
              .decode(rec.path("Data").asText), UTF_8)
            val firstAttempt = !attempted.contains(data)
            attempted += data
            val n = counter.incrementAndGet()
            if (throttleEvery > 0 && firstAttempt && n % throttleEvery == 0) {
              throttled += 1
              failedCount += 1
              val r = resps.addObject()
              r.put("ErrorCode", "ServiceUnavailableException")
              r.put("ErrorMessage", "Slow down.")
              ()
            } else {
              delivered += data
              resps.addObject()
                .put("RecordId", java.util.UUID.randomUUID.toString)
              ()
            }
          }
          o.put("FailedPutCount", failedCount)
          Http.Response(200, o.toString)
        case other =>
          Http.Response(400, s"""{"__type":"UnknownOperation: $other"}""")
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemFirehose]()

  def register(name: String, creds: Credentials,
               throttleEvery: Int = 0): MemFirehose =
    registry.computeIfAbsent(name, _ => new MemFirehose(creds, throttleEvery))
  def drop(name: String): Unit = { registry.remove(name); () }

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://")) {
      val name = url.stripPrefix("mem://").takeWhile(_ != '/')
      reqs => reqs.map { r =>
        Option(registry.get(name)).map(_.handle(r))
          .getOrElse(Http.Response(404, "no such firehose"))
      }
    } else Http.javaClient()
}
