package graft.config

import java.sql.DriverManager

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The `sqlite` buffer (buffers/sqlite.adoc): a DURABLE disk-backed
  * buffer with at-least-once acks — messages land in an embedded SQL
  * table before the pipeline reads them, survive restarts, and are
  * deleted only after the run's output delivers. The sqlite driver
  * jar is absent in this environment, so the embedded engine is
  * Derby — same file-backed durability contract, the MsSqlCdc
  * dialect-seam precedent (an honest substitution, documented).
  *
  * Lifecycle per run: [[append]] persists the incoming rows (one
  * executor-side insert batch per partition), [[readUndelivered]]
  * replays EVERYTHING still pending — including rows a crashed
  * previous run never delivered — and [[markDelivered]] removes rows
  * only after the output succeeds (Pipeline.run calls it; a failed
  * run leaves them for the next).
  */
object SqlBuffer {

  private def url(path: String) = s"jdbc:derby:$path;create=true"

  private def withConn[T](path: String)(f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url(path))
    try f(c) finally c.close()
  }

  private def ensureTable(path: String): Unit = withConn(path) { c =>
    val st = c.createStatement()
    try st.execute(
      """CREATE TABLE buffer_messages(
        |  id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        |  value CLOB,
        |  metadata CLOB)""".stripMargin)
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () // exists
    } finally st.close()
  }

  def append(df: DataFrame, path: String): Unit = {
    ensureTable(path)
    val meta = if (df.columns.contains("metadata"))
      to_json(col("metadata")) else lit(null).cast("string")
    val p = path
    df.select(col("value").cast("string"), meta.as("m"))
      .rdd.foreachPartition { it =>
        if (it.hasNext) {
          // Derby embedded is JVM-wide: executor threads in local mode
          // share the engine, real clusters point `path` at shared disk
          val c = DriverManager.getConnection(
            s"jdbc:derby:$p;create=true")
          try {
            c.setAutoCommit(false)
            val ps = c.prepareStatement(
              "INSERT INTO buffer_messages(value, metadata) VALUES(?, ?)")
            it.foreach { r =>
              ps.setString(1, r.getString(0))
              ps.setString(2, if (r.isNullAt(1)) null else r.getString(1))
              ps.addBatch()
            }
            ps.executeBatch()
            c.commit()
            ps.close()
          } finally c.close()
        }
      }
  }

  /** Everything pending, oldest first; the run's ack high-water mark
    * is remembered for [[ackPending]].
    */
  def readUndelivered(spark: SparkSession, path: String): DataFrame = {
    ensureTable(path)
    val rows = withConn(path) { c =>
      val st = c.createStatement()
      val rs = st.executeQuery(
        "SELECT id, value, metadata FROM buffer_messages ORDER BY id")
      val buf = Vector.newBuilder[(Long, String, String)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2),
        rs.getString(3)))
      rs.close(); st.close()
      buf.result()
    }
    if (rows.nonEmpty) pendingAck(path) = rows.last._1
    import spark.implicits._
    val df = rows.map { case (id, v, m) => (id, v, Option(m)) }
      .toDF("__buffer_id", "value", "__meta_json")
    val meta = when(col("__meta_json").isNotNull,
      from_json(col("__meta_json"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType)))
      .otherwise(map().cast("map<string,string>"))
    df.select(col("value"), meta.as("metadata"),
      col("__buffer_id").as("__seq"))
  }

  private val pendingAck = TrieMap.empty[String, Long]

  /** Delete delivered rows after a successful run (at-least-once: a
    * crash before this leaves them to replay).
    */
  def ackPending(path: String): Unit =
    pendingAck.remove(path).foreach { upTo =>
      withConn(path) { c =>
        val ps = c.prepareStatement(
          "DELETE FROM buffer_messages WHERE id <= ?")
        ps.setLong(1, upTo)
        ps.executeUpdate()
        ps.close()
      }
    }

  /** Pending depth (spec surface). */
  def depth(path: String): Long = {
    ensureTable(path)
    withConn(path) { c =>
      val st = c.createStatement()
      val rs = st.executeQuery("SELECT COUNT(*) FROM buffer_messages")
      rs.next()
      val n = rs.getLong(1)
      rs.close(); st.close()
      n
    }
  }
}
