package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Http

/** `hdfs` input/output (internal/impl/hdfs/{input,output}.go —
  * contract only, no code ported: the reference uses a native
  * Hadoop-RPC client library; this speaks WebHDFS, Hadoop's PUBLIC
  * REST protocol for the same filesystem operations, which runs
  * offline against a wire-shaped loopback service):
  *
  *   - output: one file per message at `directory/path` (the
  *     reference's interpolated path contract) via the documented
  *     two-step CREATE — `PUT …?op=CREATE` answers 307 with a
  *     `Location` on a datanode, the body PUTs there (201);
  *   - input: `GET …?op=LISTSTATUS` on the directory, then one
  *     message per file via `GET …?op=OPEN` (307 → datanode read),
  *     with the file name as `hdfs_path` metadata — the reference's
  *     whole-file-per-message consumption model.
  *
  * Scale shape: file bodies PUT per partition (executor-side); the
  * input's LISTSTATUS is one driver round-trip, the OPEN reads fan
  * out across partitions.
  */
object Hdfs {

  /** Write each row's `value` as one file: `directory/<pathCol>`. */
  def write(df: DataFrame, url: String, directory: String,
            pathCol: org.apache.spark.sql.Column,
            client: Http.Client = null): Unit = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    df.select(pathCol.cast("string").as("p"),
        col("value").cast("string").as("v"))
      .rdd.foreachPartition { it =>
        it.foreach { r =>
          val full = s"$directory/${r.getString(0)}".replaceAll("//+", "/")
          val createUrl = s"$base/webhdfs/v1$full?op=CREATE&overwrite=true"
          val step1 = resolved(Seq(
            Http.Request(createUrl, "PUT", Map.empty, ""))).head
          val loc =
            if (step1.status == 307)
              step1.headers.getOrElse("location",
                throw new IllegalStateException(
                  "webhdfs CREATE missing Location"))
            else throw new IllegalStateException(
              s"webhdfs CREATE returned ${step1.status}")
          val step2 = resolved(Seq(Http.Request(loc, "PUT",
            Map("Content-Type" -> "application/octet-stream"),
            r.getString(1)))).head
          if (step2.status != 201) throw new IllegalStateException(
            s"webhdfs data PUT returned ${step2.status}")
        }
      }
  }

  /** One message per file under `directory` (envelope rows with
    * `hdfs_path` metadata), LISTSTATUS order.
    */
  def read(spark: SparkSession, url: String, directory: String,
           client: Http.Client = null): DataFrame = {
    val resolved = Option(client).getOrElse(resolveClient(url))
    val base = url.stripSuffix("/")
    val lsUrl = s"$base/webhdfs/v1$directory?op=LISTSTATUS"
    val ls = resolved(Seq(Http.Request(lsUrl, "GET", Map.empty, ""))).head
    if (ls.status != 200) throw new IllegalStateException(
      s"webhdfs LISTSTATUS returned ${ls.status}: ${ls.body.take(200)}")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val names = {
      val out = Seq.newBuilder[String]
      mapper.readTree(ls.body).path("FileStatuses").path("FileStatus")
        .forEach(f => if (f.path("type").asText == "FILE")
          out += f.path("pathSuffix").asText)
      out.result()
    }
    import spark.implicits._
    val dirV = directory
    val urlV = base
    val clientV = client
    names.toDF("name").repartition(math.max(1,
        math.min(names.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val c = Option(clientV).getOrElse(resolveClient(urlV))
        it.map { r =>
          val name = r.getString(0)
          val full = s"$dirV/$name".replaceAll("//+", "/")
          val open = c(Seq(Http.Request(
            s"$urlV/webhdfs/v1$full?op=OPEN", "GET", Map.empty, ""))).head
          val body =
            if (open.status == 307) {
              val loc = open.headers("location")
              val data = c(Seq(Http.Request(loc, "GET", Map.empty, ""))).head
              if (data.status != 200) throw new IllegalStateException(
                s"webhdfs OPEN data read returned ${data.status}")
              data.body
            } else if (open.status == 200) open.body
            else throw new IllegalStateException(
              s"webhdfs OPEN returned ${open.status}")
          (body, Map("hdfs_path" -> full))
        }
      }.toDF("value", "metadata")
      .withColumn("error", lit(null).cast("string"))
  }

  // ---- in-memory namenode+datanode (mem://name) ----

  /** Path → bytes with the NN 307 / DN data split and LISTSTATUS
    * rendering in the documented WebHDFS JSON shape.
    */
  final class MemFs(name: String) {
    val files: mutable.LinkedHashMap[String, String] =
      mutable.LinkedHashMap.empty

    def handle(q: Http.Request): Http.Response = synchronized {
      val isData = q.url.contains("/dn/webhdfs/")
      val pathAndQuery = q.url.substring(q.url.indexOf("/webhdfs/v1") + 11)
      val (path, query) = pathAndQuery.span(_ != '?')
      val op = query.drop(1).split("&").collectFirst {
        case kv if kv.startsWith("op=") => kv.drop(3)
      }.getOrElse("")
      (q.verb, op, isData) match {
        case ("PUT", "CREATE", false) =>
          Http.Response(307, "", Map("location" ->
            s"mem://$name/dn${q.url.substring(q.url.indexOf("/webhdfs/"))}"))
        case ("PUT", "CREATE", true) =>
          files(path) = q.body
          Http.Response(201, "")
        case ("GET", "OPEN", false) =>
          if (!files.contains(path))
            Http.Response(404,
              """{"RemoteException":{"exception":"FileNotFoundException"}}""")
          else Http.Response(307, "", Map("location" ->
            s"mem://$name/dn${q.url.substring(q.url.indexOf("/webhdfs/"))}"))
        case ("GET", "OPEN", true) =>
          files.get(path) match {
            case Some(b) => Http.Response(200, b)
            case None => Http.Response(404, "")
          }
        case ("GET", "LISTSTATUS", _) =>
          val prefix = if (path.endsWith("/")) path else path + "/"
          val children = files.keys.toSeq
            .filter(p => p.startsWith(prefix) &&
              !p.stripPrefix(prefix).contains('/'))
            .map(_.stripPrefix(prefix))
          val statuses = children.map { n =>
            s"""{"pathSuffix":"$n","type":"FILE","length":${
              files(prefix + n).length}}"""
          }.mkString(",")
          Http.Response(200,
            s"""{"FileStatuses":{"FileStatus":[$statuses]}}""")
        case ("DELETE", "DELETE", _) =>
          val existed = files.remove(path).isDefined
          Http.Response(200, s"""{"boolean":$existed}""")
        case other =>
          Http.Response(400, s"""{"error":"unsupported $other"}""")
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemFs]()

  def named(name: String): MemFs =
    registry.computeIfAbsent(name, n => new MemFs(n))
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(named(name).handle)

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.javaClient()
}
