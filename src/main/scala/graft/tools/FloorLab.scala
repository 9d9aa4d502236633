package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkEntry
import graft.functions.expressions.GraftFunctions

/** Attribute the per-query suite floor (VERDICT r19 #4: ~0.17 s/query
  * × 197 queries ≈ a quarter of the suite total). For each named query
  * and attempt, prints:
  *   - build: wall of `fn(spark, sfDir)` — driver-side query/fixture
  *     construction (for `p_*` gates this includes the protocol
  *     fixture; for plain queries it is DataFrame assembly),
  *   - action: wall of the noop write,
  *   - within the action, from QueryPlanningTracker: analysis /
  *     optimization / physical-planning phase milliseconds,
  *   - job/stage/task counts and summed scheduler-visible task time
  *     from a listener, so (action − phases − task work) ≈ codegen +
  *     scheduling + commit residue.
  *
  * Usage: runMain graft.tools.FloorLab <attempts> <query> [query…]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (defaults sf0.1 / 32).
  */
object FloorLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val attempts = args.head.toInt
    val names = args.tail
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "16KB"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)

    val phases =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        qe.tracker.phases.foreach { case (p, s) =>
          phases.merge(p, java.lang.Long.valueOf(s.endTimeMs - s.startTimeMs),
            (a: java.lang.Long, b: java.lang.Long) =>
              java.lang.Long.valueOf(a.longValue + b.longValue))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskWallNs = new AtomicLong(0L)
    val schedDelayMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); ()
        }
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          val i = te.taskInfo
          taskWallNs.addAndGet((i.finishTime - i.launchTime) * 1000000L)
          if (te.taskMetrics != null)
            schedDelayMs.addAndGet(
              math.max(0L, (i.finishTime - i.launchTime) -
                te.taskMetrics.executorRunTime -
                te.taskMetrics.executorDeserializeTime -
                te.taskMetrics.resultSerializationTime))
          ()
        }
      })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to attempts).foreach { a =>
        spark.catalog.clearCache()
        graft.operators.Dedupe.releaseStaged()
        phases.clear(); jobs.set(0); stages.set(0); tasks.set(0)
        taskWallNs.set(0L); schedDelayMs.set(0L)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        // listener bus is async — give it a beat before reading counters
        Thread.sleep(150)
        import scala.jdk.CollectionConverters._
        val ph = phases.asScala.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
        println(f"[floor] $name a$a build=${(t1 - t0) / 1e3 / 1e6}%.3fs " +
          f"action=${(t2 - t1) / 1e3 / 1e6}%.3fs " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"taskWall=${taskWallNs.get / 1e9}%.3fs " +
          f"schedDelay=${schedDelayMs.get / 1e3}%.3fs $ph")
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
