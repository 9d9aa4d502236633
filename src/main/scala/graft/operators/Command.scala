package graft.operators

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

/** External-process processors (SURVEY.md §2.1):
  *
  *   - `command` (reference docs/modules/components/pages/processors/
  *     command.adoc:26): run an executable once per message, message
  *     content on stdin, stdout becomes the new content, non-zero exit
  *     feeds the error channel.
  *   - `subprocess` (processors/subprocess.adoc:26): one long-lived
  *     child per pipeline thread, newline-delimited request/response.
  *
  * Spark shape: `mapPartitions` — `subprocess` starts ONE child per
  * partition and streams rows through it (the direct analog of the
  * reference's per-thread child); `command` forks per row. Both keep
  * the error-channel discipline: a failed exec marks the row errored
  * instead of failing the task, so one poisoned record cannot kill a
  * 1000-executor job. Executor-side only — no driver involvement, scales
  * with partitions.
  */
object Command {

  private def rowEncoder(df: DataFrame): ExpressionEncoder[Row] =
    ExpressionEncoder(RowEncoder.encoderFor(df.schema))

  /** `command`: fork per message. `value` goes to stdin; stdout
    * (trimmed of one trailing newline) replaces `value`; non-zero exit
    * or spawn failure sets `error`.
    */
  def perMessage(df: DataFrame, argv: Seq[String],
                 valueCol: String = "value",
                 errorCol: String = "error"): DataFrame = {
    val base = ensure(df, valueCol, errorCol)
    val vIdx = base.schema.fieldIndex(valueCol)
    val eIdx = base.schema.fieldIndex(errorCol)
    val enc = rowEncoder(base)
    base.mapPartitions { rows =>
      rows.map { row =>
        if (row.getString(eIdx) != null) row
        else try {
          val p = new ProcessBuilder(argv: _*).redirectErrorStream(false).start()
          // both stdout AND stderr must be drained concurrently: a child
          // writing > the OS pipe buffer (~64 KB) to an undrained stream
          // blocks, and waitFor would then hang the Spark task forever
          val out = drain(p.getInputStream)
          val err = drain(p.getErrorStream)
          // a child may exit without reading stdin (broken pipe) — that
          // is its choice, not a spawn failure; exit code still decides
          try {
            p.getOutputStream.write(Option(row.getString(vIdx)).getOrElse("")
              .getBytes(StandardCharsets.UTF_8))
            p.getOutputStream.close()
          } catch { case _: java.io.IOException => () }
          val finished = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
          if (!finished) {
            p.destroyForcibly()
            updated(row, vIdx, row.getString(vIdx), eIdx,
              s"command timed out after ${timeoutSec}s")
          } else {
            val code = p.exitValue()
            out.join(); err.join()
            val stdout = new String(out.result, StandardCharsets.UTF_8)
                .stripSuffix("\n")
            if (code == 0) updated(row, vIdx, stdout, eIdx, null)
            else {
              val stderr = new String(err.result, StandardCharsets.UTF_8)
                .stripSuffix("\n").take(512)
              updated(row, vIdx, row.getString(vIdx), eIdx,
                s"command exited $code" +
                  (if (stderr.nonEmpty) s": $stderr" else ""))
            }
          }
        } catch { case t: Throwable =>
          updated(row, vIdx, row.getString(vIdx), eIdx,
            s"command failed: ${t.getMessage}")
        }
      }
    }(enc)
  }

  /** `subprocess`: one child PER PARTITION, newline-delimited
    * request/response (each row's value must be newline-free, as in the
    * reference's lines codec). The child is torn down when the
    * partition iterator is exhausted.
    */
  def perPartition(df: DataFrame, argv: Seq[String],
                   valueCol: String = "value",
                   errorCol: String = "error"): DataFrame = {
    val base = ensure(df, valueCol, errorCol)
    val vIdx = base.schema.fieldIndex(valueCol)
    val eIdx = base.schema.fieldIndex(errorCol)
    val enc = rowEncoder(base)
    base.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val p = new ProcessBuilder(argv: _*).start()
        // stderr never feeds the protocol — drain it so a chatty child
        // can't fill the pipe buffer and deadlock the request loop
        drain(p.getErrorStream)
        // a partially-consumed partition (LIMIT, take) never exhausts
        // this iterator; kill the child at task end either way
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => p.destroyForcibly()))
        val w = new BufferedWriter(new OutputStreamWriter(
          p.getOutputStream, StandardCharsets.UTF_8))
        val r = new BufferedReader(new InputStreamReader(
          p.getInputStream, StandardCharsets.UTF_8))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val more = rows.hasNext
            if (!more) { w.close(); r.close(); p.destroy() }
            more
          }
          def next(): Row = {
            val row = rows.next()
            if (row.getString(eIdx) != null) row
            else try {
              w.write(Option(row.getString(vIdx)).getOrElse(""))
              w.newLine(); w.flush()
              val line = r.readLine()
              if (line == null)
                updated(row, vIdx, row.getString(vIdx), eIdx,
                  "subprocess closed stdout")
              else updated(row, vIdx, line, eIdx, null)
            } catch { case t: Throwable =>
              updated(row, vIdx, row.getString(vIdx), eIdx,
                s"subprocess failed: ${t.getMessage}")
            }
          }
        }
      }
    }(enc)
  }

  /** Upper bound on one `command` child's lifetime — a stuck child must
    * not hang a task indefinitely. */
  private val timeoutSec = 60L

  private class Drainer(in: java.io.InputStream) extends Thread {
    @volatile var result: Array[Byte] = Array.empty
    setDaemon(true)
    override def run(): Unit =
      result = try in.readAllBytes() catch { case _: Throwable => Array.empty }
  }

  /** Consume a child stream on a daemon thread (never let it backpressure
    * the child into a pipe-buffer deadlock). */
  private def drain(in: java.io.InputStream): Drainer = {
    val d = new Drainer(in)
    d.start()
    d
  }

  private def ensure(df: DataFrame, valueCol: String, errorCol: String): DataFrame = {
    require(df.columns.contains(valueCol), s"missing column $valueCol")
    if (df.columns.contains(errorCol)) df
    else df.withColumn(errorCol, lit(null).cast("string"))
  }

  private def updated(row: Row, vIdx: Int, v: String,
                      eIdx: Int, e: String): Row = {
    val arr = row.toSeq.toArray
    arr(vIdx) = v
    arr(eIdx) = e
    Row.fromSeq(arr.toIndexedSeq)
  }
}
