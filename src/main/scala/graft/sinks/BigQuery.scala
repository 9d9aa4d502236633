package graft.sinks

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row}

import graft.operators.Http

/** `gcp_bigquery` output (internal/impl/gcp/output_bigquery.go —
  * contract only: the reference drives cloud.google.com/go/bigquery's
  * Loader; this implements the PUBLIC REST shape it produces): each
  * batch becomes one LOAD JOB — the payload (NDJSON or CSV lines)
  * ships inline in a `multipart/related` `jobs.insert` upload, then
  * the job is POLLED until `status.state == DONE` and
  * `status.errorResult` decides success.
  *
  * Semantics encoded (outputs/gcp_bigquery.adoc):
  *   - `write_disposition`: WRITE_APPEND (default), WRITE_TRUNCATE
  *     (the job atomically REPLACES the table — so truncate demands a
  *     single job: concurrent truncating jobs would each wipe the
  *     others), WRITE_EMPTY (job fails if the table has data);
  *   - `create_disposition`: CREATE_IF_NEEDED (atomic with the job) /
  *     CREATE_NEVER (job error when the table is absent);
  *   - jobs are atomic: a failed job contributes NO rows;
  *   - CSV: optional header line prepended per batch.
  *
  * Spark shape: one load job per partition-local batch, submitted and
  * polled executor-side (narrow, no shuffle) — except WRITE_TRUNCATE,
  * which is forced through a single partition for the atomicity noted
  * above. The real service needs GCP auth (env-blocked); `mem://`
  * routes to the in-process [[BigQuery.Service]].
  */
object BigQuery {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  final case class Conf(project: String, dataset: String, table: String,
                        format: String = "NEWLINE_DELIMITED_JSON",
                        writeDisposition: String = "WRITE_APPEND",
                        createDisposition: String = "CREATE_IF_NEEDED",
                        csvHeader: Seq[String] = Seq.empty,
                        autodetect: Boolean = true)

  private val namedServices = TrieMap.empty[String, Service]
  def serviceFor(name: String): Service =
    namedServices.getOrElseUpdate(name, new Service)
  def dropService(name: String): Unit = { namedServices.remove(name); () }

  def clientFor(baseUrl: String): Http.Client =
    if (baseUrl.startsWith("mem://"))
      serviceFor(baseUrl.stripPrefix("mem://")).client
    else Http.javaClient()

  /** Build the documented multipart/related jobs.insert body. */
  def multipartBody(boundary: String, configJson: String,
                    data: Array[Byte]): Array[Byte] = {
    val head = (s"--$boundary\r\n" +
      "Content-Type: application/json; charset=UTF-8\r\n\r\n" +
      configJson + s"\r\n--$boundary\r\n" +
      "Content-Type: application/octet-stream\r\n\r\n").getBytes("UTF-8")
    val tail = s"\r\n--$boundary--\r\n".getBytes("UTF-8")
    head ++ data ++ tail
  }

  /** Submit one load job and poll it to DONE; throws on errorResult. */
  def loadJob(conf: Conf, data: Array[Byte], c: Http.Client,
              baseUrl: String): Unit = {
    val boundary = "graft-" + java.util.UUID.randomUUID.toString
    val cfg = s"""{"configuration":{"load":{""" +
      s""""destinationTable":{"projectId":"${conf.project}",""" +
      s""""datasetId":"${conf.dataset}","tableId":"${conf.table}"},""" +
      s""""sourceFormat":"${conf.format}",""" +
      s""""writeDisposition":"${conf.writeDisposition}",""" +
      s""""createDisposition":"${conf.createDisposition}",""" +
      s""""autodetect":${conf.autodetect}}}}"""
    val base = baseUrl.stripSuffix("/")
    val submit = c(Seq(Http.Request(
      s"$base/upload/bigquery/v2/projects/${conf.project}/jobs" +
        "?uploadType=multipart",
      "POST",
      Map("Content-Type" -> s"multipart/related; boundary=$boundary"),
      "", bodyBytes = multipartBody(boundary, cfg, data)))).head
    if (submit.status != 200)
      throw new IllegalStateException(
        s"bigquery: jobs.insert ${submit.status}: ${submit.body.take(200)}")
    val jobId = mapper.readTree(submit.body).at("/jobReference/jobId")
      .asText
    // poll until DONE (the Loader.Run + job.Wait shape)
    var done = false
    var polls = 0
    while (!done) {
      polls += 1
      require(polls <= 1000, "bigquery: job poll did not converge")
      val st = c(Seq(Http.Request(
        s"$base/bigquery/v2/projects/${conf.project}/jobs/$jobId",
        "GET", Map.empty, ""))).head
      if (st.status != 200)
        throw new IllegalStateException(
          s"bigquery: jobs.get ${st.status}")
      val n = mapper.readTree(st.body)
      if (n.at("/status/state").asText("") == "DONE") {
        done = true
        val err = n.at("/status/errorResult")
        if (!err.isMissingNode && !err.isNull)
          throw new IllegalStateException(
            s"bigquery: load job failed: ${err.get("message").asText}")
      }
    }
  }

  /** Write every row's `value` (one JSON object / CSV line per row) as
    * per-partition load-job batches.
    */
  def write(df: DataFrame, conf: Conf, baseUrl: String,
            batchSize: Int = 512, valueCol: String = "value"): Unit = {
    // a truncating job REPLACES the table: parallel truncating jobs
    // would each erase the others' rows, so truncate is one job
    val src =
      if (conf.writeDisposition == "WRITE_TRUNCATE") df.coalesce(1)
      else df
    val vIdx = src.schema.fieldIndex(valueCol)
    val header =
      if (conf.format == "CSV" && conf.csvHeader.nonEmpty)
        Some(conf.csvHeader.mkString(","))
      else None
    src.foreachPartition { (it: Iterator[Row]) =>
      val c = clientFor(baseUrl)
      it.grouped(batchSize).foreach { rows =>
        val lines = header.toSeq ++ rows.map(_.getString(vIdx))
        loadJob(conf, (lines.mkString("\n") + "\n").getBytes("UTF-8"),
          c, baseUrl)
      }
    }
  }

  // ───────────────────────── in-process service ─────────────────────────

  /** BigQuery-shaped fake: multipart jobs.insert parse, disposition
    * semantics against an in-memory table registry, and a two-phase
    * job lifecycle (PENDING on submit, DONE only after a poll — the
    * data lands atomically at the DONE transition, so a never-polled
    * job has contributed nothing and a failed job never mutates).
    */
  final class Service {
    private final case class Job(key: String, rows: Vector[String],
                                 truncate: Boolean, error: Option[String],
                                 var polls: Int, var applied: Boolean)
    private val tables = TrieMap.empty[String, Vector[String]]
    private val jobs = TrieMap.empty[String, Job]
    private val idGen = new java.util.concurrent.atomic.AtomicLong(0)

    def createTable(dataset: String, table: String): Unit = {
      tables.putIfAbsent(s"$dataset.$table", Vector.empty); ()
    }

    /** NDJSON/CSV lines currently in the table. */
    def rows(dataset: String, table: String): Vector[String] =
      tables.getOrElse(s"$dataset.$table", Vector.empty)

    val client: Http.Client = reqs => reqs.map { q =>
      val path = java.net.URI.create(q.url).getPath
      if (q.verb == "POST" && path.endsWith("/jobs")) submit(q)
      else if (q.verb == "GET" && path.contains("/jobs/")) {
        poll(path.substring(path.lastIndexOf('/') + 1))
      } else Http.Response(404, """{"error":{"message":"notFound"}}""")
    }

    private def submit(q: Http.Request): Http.Response = {
      val ct = q.headers.getOrElse("Content-Type", "")
      val bIdx = ct.indexOf("boundary=")
      if (bIdx < 0)
        return Http.Response(400,
          """{"error":{"message":"malformed multipart"}}""")
      val boundary = "--" + ct.substring(bIdx + 9)
      val body = new String(q.bodyBytes, "UTF-8")
      val parts = body.split(java.util.regex.Pattern.quote(boundary))
        .toSeq.map(_.trim).filter(p => p.nonEmpty && p != "--")
      require(parts.size == 2, s"bigquery fake: ${parts.size} parts")
      def stripHead(p: String): String = {
        val i = p.indexOf("\r\n\r\n")
        if (i < 0) p else p.substring(i + 4)
      }
      val cfg = mapper.readTree(stripHead(parts.head))
      val load = cfg.at("/configuration/load")
      val ds = load.at("/destinationTable/datasetId").asText
      val tbl = load.at("/destinationTable/tableId").asText
      val key = s"$ds.$tbl"
      val writeDisp = load.path("writeDisposition")
        .asText("WRITE_APPEND")
      val createDisp = load.path("createDisposition")
        .asText("CREATE_IF_NEEDED")
      val rows = stripHead(parts(1)).split("\n").toVector
        .map(_.stripSuffix("\r")).filter(_.nonEmpty)
      val error =
        if (createDisp == "CREATE_NEVER" && !tables.contains(key))
          Some(s"Not found: Table $key")
        else if (writeDisp == "WRITE_EMPTY" &&
                 tables.get(key).exists(_.nonEmpty))
          Some(s"Already Exists: Table $key contains data " +
            "(WRITE_EMPTY)")
        else None
      val jobId = s"job_${idGen.incrementAndGet()}"
      jobs(jobId) = Job(key, rows, writeDisp == "WRITE_TRUNCATE",
        error, polls = 0, applied = false)
      Http.Response(200,
        s"""{"jobReference":{"projectId":"p","jobId":"$jobId"},""" +
          s""""status":{"state":"PENDING"}}""")
    }

    private def poll(jobId: String): Http.Response =
      jobs.get(jobId) match {
        case None =>
          Http.Response(404, """{"error":{"message":"job not found"}}""")
        case Some(j) => j.synchronized {
          j.polls += 1
          if (j.polls < 2)
            // first poll sees RUNNING: the client MUST keep polling
            Http.Response(200, """{"status":{"state":"RUNNING"}}""")
          else {
            if (!j.applied && j.error.isEmpty) {
              j.applied = true
              tables.synchronized {
                val cur =
                  if (j.truncate) Vector.empty
                  else tables.getOrElse(j.key, Vector.empty)
                tables(j.key) = cur ++ j.rows
              }
            }
            val err = j.error.map(m =>
              s""","errorResult":{"message":${quote(m)},""" +
                """"reason":"invalid"}""").getOrElse("")
            Http.Response(200, s"""{"status":{"state":"DONE"$err}}""")
          }
        }
      }

    private def quote(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }
}
