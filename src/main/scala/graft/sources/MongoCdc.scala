package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** `mongodb_cdc` input (reference internal/impl/mongodb/cdc/input.go,
  * 1,048 LoC — change streams + optional initial snapshot, resume
  * tokens persisted through a checkpoint cache, checkpoint_cache.go)
  * over the OP_MSG wire stack in [[Mongo]]. Contract only; the
  * reference rides the official mongo driver's Watch API — there is no
  * wire code to port.
  *
  * Phase order (input.go:440-530): the change stream opens FIRST and
  * its post-batch resume token marks the snapshot/stream boundary;
  * then — when no checkpoint exists and `stream_snapshot` is on — each
  * collection's current documents are emitted as operation="read"
  * messages (input.go:72); then stream events replay. With a stored
  * resume token the snapshot is skipped and the stream resumes AFTER
  * the token (no replays, no loss). A collection drop surfaces
  * `drop` + `invalidate` events and the stored token is cleared, so
  * the next read re-snapshots — input.go's invalidate handling.
  *
  * `snapshot_parallelism` > 1 shards each collection into $bucketAuto
  * _id ranges (snapshot_auto_bucket_sharding; the splitVector path
  * needs privileged access) and PARALLEL Spark tasks read the ranges,
  * one connection per task — the distributed shape that holds at
  * cluster scale. Stream drain is protocol-sequential (one cursor,
  * same as the reference's single Watch), but decoded events
  * parallelize into the returned DataFrame.
  */
object MongoCdc {

  /** One change event row. `operation` ∈ read/insert/update/replace/
    * delete/drop/invalidate; `doc` is the full document (post-image
    * for updates — update_lookup mode), null for deletes; `key` is the
    * documentKey _id as JSON; `seq` orders events (0 = snapshot).
    */
  case class Event(operation: String, db: String, collection: String,
                   doc: String, key: String, seq: Long, token: String)

  private def mapper = new ObjectMapper()

  // ─────────────────────── checkpoint cache ───────────────────────

  /** coll → resume token, as a JSON file (the reference stores the
    * same map in a cache resource; checkpoint_cache.go).
    */
  private def loadCheckpoint(path: String): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else {
      val n = mapper.readTree(new String(Files.readAllBytes(p), UTF_8))
      n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }
  }

  private def storeCheckpoint(path: String, tokens: Map[String, String]): Unit = {
    val o = mapper.createObjectNode()
    tokens.foreach { case (k, v) => o.put(k, v) }
    Files.write(Paths.get(path), o.toString.getBytes(UTF_8))
    ()
  }

  // ───────────────────────────── read ─────────────────────────────

  /** How many admission chunks the last [[read]] spilled (1 = the
    * in-memory fast path) — a test-only observable, the PgOutput
    * convention.
    */
  private[sources] var lastAdmissionChunks: Int = 0

  /** Replay the available change history of `collections` into a
    * DataFrame of [[Event]] rows and advance the checkpoint.
    *
    * BOUNDED ADMISSION (the PgOutput contract): the change-stream
    * cursor pages through getMore and at most `admitChunk` decoded
    * events stay driver-resident — beyond that, chunks spill to
    * parquet and the result reads them back, so a snapshot-scale
    * replay is O(admitChunk) driver heap, not O(stream).
    */
  def read(spark: SparkSession, url: String, database: String,
           collections: Seq[String], streamSnapshot: Boolean = true,
           snapshotParallelism: Int = 1,
           checkpointPath: Option[String] = None,
           startAtOperationTime: Option[Long] = None,
           batchSize: Int = 256,
           admitChunk: Int = 50000): Dataset[Event] = {
    import spark.implicits._
    val stored = checkpointPath.map(loadCheckpoint).getOrElse(Map.empty)
    var snapshotParts: Seq[Dataset[Event]] = Nil
    val streamed = mutable.Buffer[Event]()
    var spillBase: String = null
    var chunks = 0
    def flush(): Unit = if (streamed.nonEmpty) {
      if (spillBase == null) {
        val d = java.nio.file.Files.createTempDirectory("mongo_cdc_admit_")
        d.toFile.deleteOnExit()
        spillBase = d.toString
      }
      spark.createDataset(streamed.toSeq).write.mode("append")
        .parquet(spillBase)
      chunks += 1
      streamed.clear()
    }
    val newTokens = mutable.Map[String, String]() ++= stored
    collections.foreach { coll =>
      val c = Mongo.clientFor(url, database)
      try {
        val resume = stored.get(coll)
        // 1. open the stream first: its PBRT is the snapshot boundary
        val csSpec = mapper.createObjectNode()
        resume.foreach { t =>
          csSpec.putObject("resumeAfter").put("_data", t); ()
        }
        if (resume.isEmpty)
          startAtOperationTime.foreach { ts =>
            csSpec.put("startAtOperationTime", ts); ()
          }
        val agg = mapper.createObjectNode()
        agg.put("aggregate", coll)
        val st = agg.putArray("pipeline").addObject()
        st.set[JsonNode]("$changeStream", csSpec)
        agg.putObject("cursor")
        agg.put("batchSize", batchSize)
        var r = c.runCommand(agg)
        if (r.path("ok").asDouble(0) != 1.0)
          throw new IllegalStateException(
            s"mongodb_cdc: $$changeStream failed: ${r.path("errmsg").asText}")
        val cursorId = r.at("/cursor/id").asLong
        var pbrt = r.at("/cursor/postBatchResumeToken/_data").asText
        var batch = r.at("/cursor/firstBatch").elements().asScala.toVector
        // 2. snapshot (only on first read — no stored token). The
        // Dataset is LAZY: tasks read at action time, so documents
        // written between read() and the action can appear in both the
        // snapshot and the stream — harmless, because downstream folds
        // order by seq and replays are idempotent (same reason the
        // reference tolerates snapshot/stream overlap at the boundary).
        if (resume.isEmpty && streamSnapshot)
          snapshotParts :+= snapshot(spark, url, database, coll,
            snapshotParallelism)
        // 3. drain everything currently available, then checkpoint
        var invalidated = false
        var draining = true
        while (draining) {
          batch.foreach { e =>
            val ev = toEvent(e, database, coll)
            streamed += ev
            if (streamed.size >= admitChunk) flush()
            if (ev.operation == "invalidate") invalidated = true
          }
          if (batch.isEmpty) draining = false
          else {
            val gm = mapper.createObjectNode()
            gm.put("getMore", cursorId)
            gm.put("collection", coll)
            gm.put("batchSize", batchSize)
            r = c.runCommand(gm)
            pbrt = r.at("/cursor/postBatchResumeToken/_data").asText
            batch = r.at("/cursor/nextBatch").elements().asScala.toVector
          }
        }
        // an invalidate kills the stream: clear the token so the next
        // read re-snapshots (input.go invalidate handling)
        if (invalidated) newTokens -= coll else newTokens(coll) = pbrt
      } finally c.close()
    }
    checkpointPath.foreach(storeCheckpoint(_, newTokens.toMap))
    val streamDs =
      if (chunks == 0) spark.createDataset(streamed.toSeq)
      else {
        flush() // tail chunk
        spark.read.parquet(spillBase).as[Event]
      }
    lastAdmissionChunks = math.max(1, chunks)
    (snapshotParts :+ streamDs).reduce(_ unionByName _)
  }

  /** Streaming form ([[PollStream]] poller): cursor = resume token.
    * First sweep (no cursor) emits the collection snapshot as
    * operation="read" messages plus the stream boundary token; later
    * sweeps emit exactly the change events past the cursor. One sweep
    * = one micro-batch, checkpoint-atomic with the offset.
    */
  def poller(url: String, database: String, collection: String,
             batchSize: Int = 256): PollStream.Poller = { cursorOpt =>
    val c = Mongo.clientFor(url, database)
    try {
      val csSpec = mapper.createObjectNode()
      cursorOpt.foreach { t =>
        csSpec.putObject("resumeAfter").put("_data", t); ()
      }
      val agg = mapper.createObjectNode()
      agg.put("aggregate", collection)
      val st = agg.putArray("pipeline").addObject()
      st.set[JsonNode]("$changeStream", csSpec)
      agg.putObject("cursor")
      agg.put("batchSize", batchSize)
      val r0 = c.runCommand(agg)
      if (r0.path("ok").asDouble(0) != 1.0)
        throw new IllegalStateException(
          s"mongodb_cdc poll: ${r0.path("errmsg").asText}")
      val cursorId = r0.at("/cursor/id").asLong
      var pbrt = r0.at("/cursor/postBatchResumeToken/_data").asText
      val out = Vector.newBuilder[PollStream.Payload]
      def emit(ev: Event): Unit = {
        val o = mapper.createObjectNode()
        o.put("operation", ev.operation)
        if (ev.doc != null) o.set[JsonNode]("doc", mapper.readTree(ev.doc))
        if (ev.key != null) o.set[JsonNode]("key", mapper.readTree(ev.key))
        out += ((o.toString, Map(
          "mongodb_database" -> ev.db,
          "mongodb_collection" -> ev.collection,
          "operation" -> ev.operation,
          "resume_token" -> ev.token)))
        ()
      }
      if (cursorOpt.isEmpty)
        c.find(collection).foreach(d =>
          emit(Event("read", database, collection, d.toString,
            d.path("_id").toString, 0L, "")))
      var batch = r0.at("/cursor/firstBatch").elements().asScala.toVector
      var draining = true
      while (draining) {
        batch.foreach(e => emit(toEvent(e, database, collection)))
        if (batch.isEmpty) draining = false
        else {
          val gm = mapper.createObjectNode()
          gm.put("getMore", cursorId)
          gm.put("collection", collection)
          gm.put("batchSize", batchSize)
          val r = c.runCommand(gm)
          pbrt = r.at("/cursor/postBatchResumeToken/_data").asText
          batch = r.at("/cursor/nextBatch").elements().asScala.toVector
        }
      }
      (out.result(), Some(pbrt))
    } finally c.close()
  }

  private def toEvent(e: JsonNode, db: String, coll: String): Event =
    Event(
      operation = e.path("operationType").asText,
      db = e.at("/ns/db").asText(db),
      collection = e.at("/ns/coll").asText(coll),
      doc = if (e.hasNonNull("fullDocument")) e.get("fullDocument").toString
            else null,
      key = if (e.has("documentKey")) e.at("/documentKey/_id").toString
            else null,
      seq = e.path("clusterTime").asLong,
      token = e.at("/_id/_data").asText)

  /** Initial snapshot of one collection as operation="read" events.
    * parallelism > 1: $bucketAuto _id ranges fanned across Spark
    * tasks, each over its own connection (readParallelSnapshot).
    */
  def snapshot(spark: SparkSession, url: String, database: String,
               coll: String, parallelism: Int): Dataset[Event] = {
    import spark.implicits._
    val ranges: Seq[(String, String)] =
      if (parallelism <= 1) Seq((null, null))
      else {
        val c = Mongo.clientFor(url, database)
        try {
          val spec = mapper.createObjectNode()
          val ba = spec.putObject("$bucketAuto")
          ba.put("groupBy", "$_id")
          ba.put("buckets", parallelism)
          c.aggregate(coll, Seq(spec))
            .map(b => (b.at("/_id/min").toString, b.at("/_id/max").toString))
        } finally c.close()
      }
    if (ranges.isEmpty) return spark.emptyDataset[Event]
    spark.createDataset(ranges)
      .repartition(ranges.size)
      .mapPartitions { it =>
        val m = new ObjectMapper()
        it.flatMap { case (min, max) =>
          val c = Mongo.clientFor(url, database)
          try {
            val filter: JsonNode =
              if (min == null) m.createObjectNode()
              else {
                val f = m.createObjectNode()
                val id = f.putObject("_id")
                id.set[JsonNode]("$gte", m.readTree(min))
                id.set[JsonNode]("$lte", m.readTree(max))
                f
              }
            c.find(coll, filter).map { d =>
              Event("read", database, coll, d.toString,
                d.path("_id").toString, 0L, "")
            }
          } finally c.close()
        }
      }
  }
}
