package graft.sinks

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Vector-database sink/processor seam — the qdrant connector contract
  * (internal/impl/qdrant/client.go: `Upsert(collection, points)` where
  * a point is (id, vector, payload), and `Query(collection, vector,
  * limit)` returning scored nearest points; outputs/qdrant.adoc +
  * processors/qdrant.adoc config surface).
  *
  * The pluggable [[VectorStore.Client]] is the same injectable pattern
  * as Broker/Mq/Http: `mem://<name>` resolves to the in-process
  * [[VectorStore.InMemory]] fake — an EXACT scorer (cosine/dot/euclid,
  * qdrant's metric vocabulary), so correctness gates compare against a
  * pure-SQL oracle; a real deployment plugs a gRPC client into the
  * same seam.
  *
  * Scale shape: upserts stream out of `foreachPartition` in bounded
  * chunks (the reference batches its gRPC upserts the same way) — no
  * collect, no shuffle of vectors; query enrichment is a batched
  * `mapPartitions`. The in-memory query is O(collection) per probe —
  * the SCALE path for similarity search inside the engine is
  * [[graft.operators.Similarity]] (LSH/IVF); this seam exists to hold
  * the CONNECTOR contract, where the heavy search runs in the external
  * store.
  */
object VectorStore {

  final case class Point(id: Long, vector: Array[Float],
                         payload: Map[String, String] = Map.empty)
  final case class Scored(id: Long, score: Double,
                          payload: Map[String, String])

  trait Client {
    def createCollection(name: String, dim: Int, metric: String): Unit
    def upsert(collection: String, points: Seq[Point]): Unit
    def count(collection: String): Long
    /** Top-`limit` by metric score (desc, ties by id asc). */
    def query(collection: String, vector: Array[Float], limit: Int): Seq[Scored]
    def delete(collection: String, ids: Seq[Long]): Unit
  }

  /** In-process store: exact scan scoring. JVM-wide named registry so
    * `local[*]` executor threads share it (a documented test client,
    * NOT a server).
    */
  final class InMemory extends Client {
    private final case class Coll(dim: Int, metric: String,
                                  points: TrieMap[Long, Point])
    private val colls = TrieMap.empty[String, Coll]

    def createCollection(name: String, dim: Int, metric: String): Unit = {
      require(Seq("cosine", "dot", "euclid").contains(metric),
        s"metric: $metric")
      colls.putIfAbsent(name, Coll(dim, metric, TrieMap.empty)).foreach { c =>
        require(c.dim == dim && c.metric == metric,
          s"collection $name already exists with dim=${c.dim} metric=${c.metric}")
      }
    }

    private def coll(name: String): Coll = colls.getOrElse(name,
      throw new IllegalArgumentException(s"unknown collection: $name"))

    def upsert(collection: String, points: Seq[Point]): Unit = {
      val c = coll(collection)
      points.foreach { p =>
        require(p.vector.length == c.dim,
          s"point ${p.id}: dim ${p.vector.length} != collection dim ${c.dim}")
        c.points.put(p.id, p)
      }
    }

    def count(collection: String): Long = coll(collection).points.size.toLong

    def query(collection: String, vector: Array[Float], limit: Int): Seq[Scored] = {
      val c = coll(collection)
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
      val score: Point => Double = c.metric match {
        case "dot" => p => dot(vector, p.vector)
        case "euclid" => p => { // higher = closer, qdrant-style
          var s = 0.0; var i = 0
          while (i < vector.length) {
            val d = vector(i).toDouble - p.vector(i).toDouble; s += d * d; i += 1
          }
          -math.sqrt(s)
        }
        case _ => p => dot(vector, p.vector) / (norm(vector) * norm(p.vector))
      }
      c.points.values.toVector
        .map(p => Scored(p.id, score(p), p.payload))
        .sortBy(s => (-s.score, s.id))
        .take(limit)
    }

    def delete(collection: String, ids: Seq[Long]): Unit = {
      val c = coll(collection)
      ids.foreach(c.points.remove)
    }
  }

  object InMemory {
    private val registry = TrieMap.empty[String, InMemory]
    def named(name: String): InMemory =
      registry.getOrElseUpdate(name, new InMemory)
    def drop(name: String): Unit = { registry.remove(name); () }
  }

  def clientFor(address: String): Client =
    if (address.startsWith("mem://")) InMemory.named(address.stripPrefix("mem://"))
    else throw new IllegalArgumentException(
      s"no vector-store client for '$address' in this environment " +
        "(mem:// is the in-process fake; real stores need a gRPC client)")

  /** Sink: upsert every row as a point. Chunked executor-side writes
    * (the reference's batched gRPC upsert), no driver round-trip.
    */
  def upsert(df: DataFrame, address: String, collection: String,
             idCol: String, vecCol: String,
             payloadCols: Seq[String] = Seq.empty,
             chunk: Int = 256): Unit = {
    val iIdx = df.schema.fieldIndex(idCol)
    val vIdx = df.schema.fieldIndex(vecCol)
    val pIdx = payloadCols.map(c => c -> df.schema.fieldIndex(c))
    df.foreachPartition { (it: Iterator[Row]) =>
      val client = clientFor(address)
      it.grouped(chunk).foreach { rows =>
        client.upsert(collection, rows.map { r =>
          Point(r.getLong(iIdx),
            r.getSeq[Float](vIdx).toArray,
            pIdx.collect { case (c, i) if !r.isNullAt(i) =>
              c -> r.get(i).toString }.toMap)
        })
      }
    }
  }

  /** Processor: append the store's top-k for each row's vector as
    * `outCol` = array<struct<id bigint, score double>> — the qdrant
    * processor's enrichment shape. Scores are raw doubles; round at
    * the query level when hash-comparing against a SQL oracle.
    */
  def queryEnrich(df: DataFrame, address: String, collection: String,
                  vecCol: String, k: Int, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol,
      ArrayType(StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = false))))))
    val vIdx = df.schema.fieldIndex(vecCol)
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      val client = clientFor(address)
      it.map { r =>
        val hits =
          if (r.isNullAt(vIdx)) null
          else client.query(collection, r.getSeq[Float](vIdx).toArray, k)
            .map(s => Row(s.id, s.score))
        Row.fromSeq(r.toSeq :+ hits)
      }
    }
  }
}
