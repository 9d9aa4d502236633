package graft.sources

import scala.collection.concurrent.TrieMap
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** NATS JetStream key-value bucket seam (inputs/nats_kv.adoc,
  * outputs/nats_kv.adoc, processors/nats_kv.adoc, caches/nats_kv.adoc)
  * — a revisioned KV store: every put/delete/purge advances one
  * GLOBAL bucket revision (JetStream stream sequence), deletes are
  * tombstones that keep history, and `keys` filters with the NATS
  * subject wildcard grammar ([[PubSub.matches]]).
  *
  * `mem://<name>` resolves to the in-process fake; real deployments
  * need a NATS client at this seam (same convention as the other
  * transports).
  */
object NatsKv {

  final case class Entry(key: String, value: String, revision: Long,
                         operation: String, createdMs: Long)

  final class Bucket(val name: String) {
    private val hist = mutable.LinkedHashMap.empty[String, ArrayBuffer[Entry]]
    private var revision = 0L
    @volatile var nowMs: () => Long = () => System.currentTimeMillis()

    private def append(key: String, value: String, op: String): Entry =
      synchronized {
        revision += 1
        val e = Entry(key, value, revision, op, nowMs())
        hist.getOrElseUpdate(key, ArrayBuffer.empty) += e
        e
      }

    def put(key: String, value: String): Entry = append(key, value, "PUT")

    /** Adds only if absent (or last op deleted it); errors otherwise. */
    def create(key: String, value: String): Entry = synchronized {
      latest(key) match {
        case Some(e) if e.operation == "PUT" =>
          throw new IllegalArgumentException(
            s"nats_kv create: key '$key' already exists (rev ${e.revision})")
        case _ => append(key, value, "PUT")
      }
    }

    /** Compare-and-set on the key's current revision. */
    def update(key: String, value: String, expectedRev: Long): Entry =
      synchronized {
        val cur = latest(key).getOrElse(throw new IllegalArgumentException(
          s"nats_kv update: key '$key' does not exist"))
        if (cur.revision != expectedRev)
          throw new IllegalArgumentException(
            s"nats_kv update: revision mismatch for '$key' " +
              s"(expected $expectedRev, at ${cur.revision})")
        append(key, value, "PUT")
      }

    /** Tombstone; history stays. */
    def delete(key: String): Entry = append(key, null, "DEL")

    /** Tombstone AND drop prior history (adoc purge semantics). */
    def purge(key: String): Entry = synchronized {
      hist.remove(key)
      append(key, null, "PURGE")
    }

    def latest(key: String): Option[Entry] =
      synchronized(hist.get(key).flatMap(_.lastOption))

    def get(key: String): Entry = latest(key) match {
      case Some(e) if e.operation == "PUT" => e
      case _ => throw new IllegalArgumentException(
        s"nats_kv get: key '$key' not found")
    }

    def getRevision(key: String, rev: Long): Entry =
      synchronized(hist.get(key).flatMap(_.find(_.revision == rev)))
        .getOrElse(throw new IllegalArgumentException(
          s"nats_kv get_revision: '$key' has no revision $rev"))

    def history(key: String): Vector[Entry] =
      synchronized(hist.get(key).map(_.toVector).getOrElse(Vector.empty))

    /** Keys with a live (non-tombstone) latest value matching the NATS
      * wildcard `filter`.
      */
    def keys(filter: String = ">"): Vector[String] = synchronized {
      hist.keysIterator.filter { k =>
        latest(k).exists(_.operation == "PUT") &&
          PubSub.matches("nats", filter, k)
      }.toVector.sorted
    }

    /** Latest live entries (the bounded form of the watch input). */
    def snapshot(): Vector[Entry] = synchronized {
      hist.keysIterator.flatMap(latest).filter(_.operation == "PUT")
        .toVector.sortBy(_.revision)
    }

    def currentRevision: Long = synchronized(revision)
  }

  object Bucket {
    private val registry = TrieMap.empty[String, Bucket]
    def named(address: String, bucket: String): Bucket = {
      require(address.startsWith("mem://"),
        s"no nats_kv transport for '$address' in this environment")
      registry.getOrElseUpdate(
        address.stripPrefix("mem://") + "/" + bucket, new Bucket(bucket))
    }
  }

  private def entryMeta(b: Bucket, e: Entry): Map[String, String] = Map(
    "nats_kv_key" -> e.key,
    "nats_kv_bucket" -> b.name,
    "nats_kv_revision" -> e.revision.toString,
    "nats_kv_delta" -> (b.currentRevision - e.revision).toString,
    "nats_kv_operation" -> e.operation,
    "nats_kv_created" -> e.createdMs.toString)

  /** inputs/nats_kv.adoc bounded form: the current live entry of every
    * key (a watch that catches up and stops), full nats_kv_* metadata.
    */
  def read(spark: SparkSession, address: String, bucket: String): DataFrame = {
    val b = Bucket.named(address, bucket)
    val rows = b.snapshot().map { e =>
      Row(e.value, entryMeta(b, e), null, e.revision)
    }
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      rows.length / 1024 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), BrokerStream.schema)
  }

  /** outputs/nats_kv.adoc — put every row's value under its
    * interpolated key; per-key order follows `orderCol` (one sorted
    * reducer per key, the transport-writer shape).
    */
  def write(df: DataFrame, address: String, bucket: String, keyCol: Column,
            valueCol: Column, orderCol: Column): Unit = {
    val prepared = df.select(keyCol.cast("string").as("__k"),
      valueCol.cast("string").as("__v"), orderCol.cast("long").as("__o"))
    prepared.repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__o"))
      .foreachPartition { (it: Iterator[Row]) =>
        val b = NatsKv.Bucket.named(address, bucket)
        it.foreach(r => b.put(r.getString(0), r.getString(1)))
      }
  }

  /** caches/nats_kv.adoc — relational (key, value) view of the live
    * entries for the cache processor's broadcast join.
    */
  def cacheView(spark: SparkSession, address: String,
                bucket: String): DataFrame = {
    val b = Bucket.named(address, bucket)
    import spark.implicits._
    b.snapshot().map(e => (e.key, e.value)).toDF("key", "value")
  }

  /** processors/nats_kv.adoc — per-row operation. `__kvkey` is the
    * interpolated key, `__kvrev` the revision (get_revision/update).
    * get-family ops replace content with the value and set the full
    * metadata; mutation ops keep content and set revision metadata;
    * `keys`/`history` replace content with the documented JSON arrays.
    * Failures (create-exists, update-CAS, missing keys) take the
    * row's error channel.
    */
  def applyOps(df: DataFrame, address: String, bucket: String,
               operation: String): DataFrame = {
    val schema = df.schema
    val vIdx = schema.fieldIndex("value")
    val eIdx = schema.fieldIndex("error")
    val mIdx = schema.fieldIndex("metadata")
    val kIdx = schema.fieldIndex("__kvkey")
    val rIdx = schema.fieldIndex("__kvrev")
    val out = df.rdd.mapPartitions { it =>
      val b = NatsKv.Bucket.named(address, bucket)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def entryJson(e: Entry): String = {
        val n = mapper.createObjectNode()
        n.put("key", e.key).put("value", e.value).put("bucket", b.name)
          .put("revision", e.revision)
          .put("delta", b.currentRevision - e.revision)
          .put("operation", e.operation).put("created", e.createdMs)
        n.toString
      }
      it.map { r =>
        val vals = r.toSeq.toArray
        if (vals(eIdx) == null) try {
          val key = if (r.isNullAt(kIdx)) "" else r.getString(kIdx)
          val value = if (r.isNullAt(vIdx)) null else r.getString(vIdx)
          def setMeta(m: Map[String, String]): Unit =
            vals(mIdx) = (if (r.isNullAt(mIdx)) Map.empty[String, String]
                          else r.getMap[String, String](mIdx).toMap) ++ m
          operation match {
            case "get" =>
              val e = b.get(key); vals(vIdx) = e.value; setMeta(entryMeta(b, e))
            case "get_revision" =>
              val e = b.getRevision(key, r.getLong(rIdx))
              vals(vIdx) = e.value; setMeta(entryMeta(b, e))
            case "put" =>
              val e = b.put(key, value); setMeta(entryMeta(b, e))
            case "create" =>
              val e = b.create(key, value); setMeta(entryMeta(b, e))
            case "update" =>
              val e = b.update(key, value, r.getLong(rIdx))
              setMeta(entryMeta(b, e))
            case "delete" =>
              val e = b.delete(key); setMeta(entryMeta(b, e))
            case "purge" =>
              val e = b.purge(key); setMeta(entryMeta(b, e))
            case "history" =>
              vals(vIdx) = b.history(key).map(entryJson)
                .mkString("[", ",", "]")
              setMeta(Map("nats_kv_bucket" -> b.name))
            case "keys" =>
              vals(vIdx) = b.keys(if (key.isEmpty) ">" else key)
                .map(mapper.writeValueAsString).mkString("[", ",", "]")
              setMeta(Map("nats_kv_bucket" -> b.name))
            case other => throw new IllegalArgumentException(
              s"nats_kv operation '$other'")
          }
        } catch {
          case e: Exception => vals(eIdx) = e.getMessage
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    // barrier the side effects against stage replay (sql_insert
    // convention)
    df.sparkSession.createDataFrame(out, schema)
      .drop("__kvkey", "__kvrev").localCheckpoint()
  }
}
