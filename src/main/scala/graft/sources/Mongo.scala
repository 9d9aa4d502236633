package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** MongoDB over the PUBLIC wire protocol — BSON and OP_MSG — the
  * native-driver-blocked family (reference `internal/impl/mongodb`:
  * input.go find/aggregate, processor.go + output.go with the
  * insert-one/delete-one/delete-many/replace-one/update-one/find-one
  * operations; the reference rides mongo-driver, this implements the
  * documented formats: bsonspec.org and the MongoDB wire protocol's
  * OP_MSG opcode 2013).
  *
  * BSON subset (every type the reference's document maps produce):
  * double, string, document, array, binary, ObjectId, bool, UTC
  * datetime, null, int32, int64 — mapped to/from JSON in RELAXED
  * extended-JSON form (`json_marshal_mode: relaxed`): plain numbers,
  * `{"$oid": hex}`, `{"$date": ISO}`.
  *
  * Wire: OP_MSG only (the modern conversation: header of 4 LE int32s,
  * flagBits, one kind-0 body section); commands hello / insert /
  * find+getMore (cursor batches) / update / delete / aggregate.
  *
  * Spark shape: the INPUT walks one cursor (driver admission, like
  * every single-connection source) and parallelizes the documents;
  * the OUTPUT/processor opens one connection per partition and
  * executes operations executor-side — no shuffle. `mongodb://` real
  * servers are env-blocked; `mem://` routes to the in-process
  * [[Mongo.Server]] speaking the same bytes over a real socket.
  */
object Mongo {

  private def mapper = Shared.mapper
  private object Shared { val mapper = new ObjectMapper() }

  // ─────────────────────────── BSON ───────────────────────────

  object Bson {
    def encode(doc: JsonNode): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      writeDoc(out, doc)
      out.toByteArray
    }

    private def writeDoc(out: java.io.ByteArrayOutputStream,
                         doc: JsonNode): Unit = {
      val body = new java.io.ByteArrayOutputStream()
      if (doc.isObject)
        doc.properties().asScala.foreach(e =>
          writeElement(body, e.getKey, e.getValue))
      else if (doc.isArray)
        doc.elements().asScala.zipWithIndex.foreach { case (v, i) =>
          writeElement(body, i.toString, v)
        }
      else throw new IllegalArgumentException(s"bson: not a document")
      val total = 4 + body.size() + 1
      writeI32(out, total)
      body.writeTo(out)
      out.write(0)
    }

    private def writeI32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v); o.write(v >> 8); o.write(v >> 16); o.write(v >> 24)
    }
    private def writeI64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      writeI32(o, v.toInt); writeI32(o, (v >> 32).toInt)
    }
    private def cstr(o: java.io.ByteArrayOutputStream, s: String): Unit = {
      o.write(s.getBytes(UTF_8)); o.write(0)
    }

    private def writeElement(o: java.io.ByteArrayOutputStream,
                             name: String, v: JsonNode): Unit = {
      if (v.isObject && v.size == 1 && v.has("$oid")) {
        o.write(0x07); cstr(o, name)
        val hex = v.get("$oid").asText
        o.write(hex.grouped(2)
          .map(p => Integer.parseInt(p, 16).toByte).toArray)
      } else if (v.isObject && v.size == 1 && v.has("$date")) {
        o.write(0x09); cstr(o, name)
        writeI64(o, java.time.Instant.parse(v.get("$date").asText)
          .toEpochMilli)
      } else if (v.isObject && v.size == 1 && v.has("$binary")) {
        o.write(0x05); cstr(o, name)
        val b = java.util.Base64.getDecoder
          .decode(v.at("/$binary/base64").asText)
        writeI32(o, b.length); o.write(0); o.write(b)
      } else if (v.isObject) {
        o.write(0x03); cstr(o, name); writeDoc(o, v)
      } else if (v.isArray) {
        o.write(0x04); cstr(o, name); writeDoc(o, v)
      } else if (v.isTextual) {
        o.write(0x02); cstr(o, name)
        val b = v.asText.getBytes(UTF_8)
        writeI32(o, b.length + 1); o.write(b); o.write(0)
      } else if (v.isBoolean) {
        o.write(0x08); cstr(o, name); o.write(if (v.asBoolean) 1 else 0)
      } else if (v.isNull) {
        o.write(0x0a); cstr(o, name)
      } else if (v.isIntegralNumber) {
        val l = v.asLong
        if (l >= Int.MinValue && l <= Int.MaxValue) {
          o.write(0x10); cstr(o, name); writeI32(o, l.toInt)
        } else { o.write(0x12); cstr(o, name); writeI64(o, l) }
      } else if (v.isNumber) {
        o.write(0x01); cstr(o, name)
        writeI64(o, java.lang.Double.doubleToLongBits(v.asDouble))
      } else throw new IllegalArgumentException(
        s"bson: unsupported node $v")
    }

    def decode(bytes: Array[Byte]): ObjectNode =
      readDoc(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))
        .asInstanceOf[ObjectNode]

    private def readDoc(b: ByteBuffer): JsonNode = {
      val len = b.getInt
      val end = b.position() + len - 4
      val obj = mapper.createObjectNode()
      var isArray = true
      var idx = 0
      val entries = Vector.newBuilder[(String, JsonNode)]
      while (b.position() < end - 1) {
        val tpe = b.get() & 0xff
        val name = readCstr(b)
        if (name != idx.toString) isArray = false
        idx += 1
        entries += name -> readValue(b, tpe)
      }
      require((b.get() & 0xff) == 0, "bson: missing terminator")
      val es = entries.result()
      if (isArray && es.nonEmpty) {
        val arr = mapper.createArrayNode()
        es.foreach { case (_, v) => arr.add(v); () }
        arr
      } else {
        es.foreach { case (k, v) => obj.set[JsonNode](k, v); () }
        obj
      }
    }

    private def readCstr(b: ByteBuffer): String = {
      val sb = new java.io.ByteArrayOutputStream()
      var c = b.get()
      while (c != 0) { sb.write(c); c = b.get() }
      new String(sb.toByteArray, UTF_8)
    }

    private def readValue(b: ByteBuffer, tpe: Int): JsonNode = tpe match {
      case 0x01 => mapper.getNodeFactory.numberNode(b.getDouble)
      case 0x02 =>
        val len = b.getInt
        val s = new Array[Byte](len - 1); b.get(s); b.get()
        mapper.getNodeFactory.textNode(new String(s, UTF_8))
      case 0x03 | 0x04 => readDoc(b)
      case 0x05 =>
        val len = b.getInt; b.get() // subtype
        val d = new Array[Byte](len); b.get(d)
        val o = mapper.createObjectNode()
        o.putObject("$binary").put("base64",
          java.util.Base64.getEncoder.encodeToString(d))
          .put("subType", "00")
        o
      case 0x07 =>
        val d = new Array[Byte](12); b.get(d)
        val o = mapper.createObjectNode()
        o.put("$oid", d.map(x => f"${x & 0xff}%02x").mkString)
        o
      case 0x08 => mapper.getNodeFactory.booleanNode(b.get() != 0)
      case 0x09 =>
        val ms = b.getLong
        val o = mapper.createObjectNode()
        o.put("$date", java.time.Instant.ofEpochMilli(ms).toString)
        o
      case 0x0a => mapper.getNodeFactory.nullNode()
      case 0x10 => mapper.getNodeFactory.numberNode(b.getInt)
      case 0x12 => mapper.getNodeFactory.numberNode(b.getLong)
      case other =>
        throw new IllegalArgumentException(f"bson: type 0x$other%02x")
    }
  }

  // ─────────────────────────── OP_MSG ───────────────────────────

  val OpMsg = 2013

  private val reqIds = new java.util.concurrent.atomic.AtomicInteger(1)

  def writeOpMsg(out: OutputStream, body: JsonNode,
                 responseTo: Int = 0): Int = {
    val doc = Bson.encode(body)
    val len = 16 + 4 + 1 + doc.length
    val b = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    val reqId = reqIds.getAndIncrement()
    b.putInt(len).putInt(reqId).putInt(responseTo).putInt(OpMsg)
    b.putInt(0) // flagBits
    b.put(0.toByte) // section kind 0: body
    b.put(doc)
    out.write(b.array()); out.flush()
    reqId
  }

  /** One OP_MSG body document (returns (requestId, body)). */
  def readOpMsg(in: InputStream): (Int, ObjectNode) = {
    val din = new DataInputStream(in)
    val head = new Array[Byte](16)
    din.readFully(head)
    val hb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    val len = hb.getInt
    val reqId = hb.getInt
    hb.getInt // responseTo
    val op = hb.getInt
    require(op == OpMsg, s"mongo: opcode $op (only OP_MSG spoken here)")
    val rest = new Array[Byte](len - 16)
    din.readFully(rest)
    val rb = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    rb.getInt // flags
    val kind = rb.get() & 0xff
    require(kind == 0, s"mongo: section kind $kind unsupported")
    val doc = new Array[Byte](rest.length - 5)
    rb.get(doc)
    (reqId, Bson.decode(doc))
  }

  // ─────────────────────────── client ───────────────────────────

  /** Blocking single-connection client: runCommand over OP_MSG. */
  final class Client(host: String, port: Int, database: String) {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), 10000)
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)

    // handshake: hello names the conversation
    require(runCommand(obj("hello" -> mapper.getNodeFactory.numberNode(1)))
      .path("ok").asDouble(0) == 1.0, "mongo: hello failed")

    def runCommand(cmd: ObjectNode): ObjectNode = synchronized {
      cmd.put("$db", database)
      writeOpMsg(out, cmd)
      val (_, resp) = readOpMsg(in)
      resp
    }

    def insert(coll: String, docs: Seq[JsonNode]): Int = {
      val c = obj("insert" -> mapper.getNodeFactory.textNode(coll))
      val arr = c.putArray("documents")
      docs.foreach(d => { arr.add(d); () })
      val r = checkOk(runCommand(c), "insert")
      r.path("n").asInt(0)
    }

    /** Full cursor walk: find + getMore until exhausted. */
    def find(coll: String, filter: JsonNode = mapper.createObjectNode(),
             sort: Option[JsonNode] = None, limit: Int = 0,
             batchSize: Int = 101): Vector[JsonNode] = {
      val c = obj("find" -> mapper.getNodeFactory.textNode(coll))
      c.set[JsonNode]("filter", filter)
      sort.foreach(s => { c.set[JsonNode]("sort", s); () })
      if (limit > 0) c.put("limit", limit)
      c.put("batchSize", batchSize)
      var r = checkOk(runCommand(c), "find")
      val outDocs = Vector.newBuilder[JsonNode]
      r.at("/cursor/firstBatch").elements().asScala
        .foreach(d => outDocs += d)
      var cursorId = r.at("/cursor/id").asLong(0)
      while (cursorId != 0) {
        val gm = obj("getMore" -> mapper.getNodeFactory.numberNode(cursorId))
        gm.put("collection", coll)
        gm.put("batchSize", batchSize)
        r = checkOk(runCommand(gm), "getMore")
        r.at("/cursor/nextBatch").elements().asScala
          .foreach(d => outDocs += d)
        cursorId = r.at("/cursor/id").asLong(0)
      }
      outDocs.result()
    }

    def findOne(coll: String, filter: JsonNode): Option[JsonNode] =
      find(coll, filter, limit = 1).headOption

    def update(coll: String, q: JsonNode, u: JsonNode,
               upsert: Boolean = false, multi: Boolean = false): (Int, Int) = {
      val c = obj("update" -> mapper.getNodeFactory.textNode(coll))
      val e = c.putArray("updates").addObject()
      e.set[JsonNode]("q", q)
      e.set[JsonNode]("u", u)
      e.put("upsert", upsert).put("multi", multi)
      val r = checkOk(runCommand(c), "update")
      (r.path("n").asInt(0), r.path("nModified").asInt(0))
    }

    def delete(coll: String, q: JsonNode, limit: Int): Int = {
      val c = obj("delete" -> mapper.getNodeFactory.textNode(coll))
      val e = c.putArray("deletes").addObject()
      e.set[JsonNode]("q", q)
      e.put("limit", limit)
      checkOk(runCommand(c), "delete").path("n").asInt(0)
    }

    def aggregate(coll: String, pipeline: Seq[JsonNode]): Vector[JsonNode] = {
      val c = obj("aggregate" -> mapper.getNodeFactory.textNode(coll))
      val arr = c.putArray("pipeline")
      pipeline.foreach(s => { arr.add(s); () })
      c.putObject("cursor")
      val r = checkOk(runCommand(c), "aggregate")
      r.at("/cursor/firstBatch").elements().asScala.toVector
    }

    private def checkOk(r: ObjectNode, what: String): ObjectNode = {
      if (r.path("ok").asDouble(0) != 1.0)
        throw new IllegalStateException(
          s"mongo: $what failed: ${r.path("errmsg").asText(r.toString)}")
      r
    }

    def close(): Unit = { try socket.close() catch { case _: Exception => () } }

    private def obj(kv: (String, JsonNode)): ObjectNode = {
      val o = mapper.createObjectNode()
      o.set[JsonNode](kv._1, kv._2)
      o
    }
  }

  /** `mem://name:db` → a client against the in-process server. */
  def clientFor(url: String, database: String): Client =
    if (url.startsWith("mem://")) {
      val srv = named(url.stripPrefix("mem://"))
      new Client("127.0.0.1", srv.port, database)
    } else throw new IllegalArgumentException(
      s"mongo: only mem:// loopback servers exist in this environment " +
        s"(got $url; a real mongod needs network egress)")

  private val registry = TrieMap.empty[String, Server]
  def named(name: String): Server =
    registry.getOrElseUpdate(name, new Server)
  def drop(name: String): Unit = {
    registry.remove(name).foreach(_.stop())
  }

  // ─────────────────────── spark components ───────────────────────

  /** `mongodb` INPUT (input.go): one find/aggregate cursor walk, one
    * message per document (relaxed extended JSON), then the input is
    * exhausted. Cursor admission is driver-side; documents
    * parallelize.
    */
  def read(spark: SparkSession, url: String, database: String,
           collection: String, queryJson: String = "{}",
           operation: String = "find",
           sortJson: String = "", batchSize: Int = 101): DataFrame = {
    val c = clientFor(url, database)
    try {
      val docs = operation match {
        case "find" =>
          c.find(collection, mapper.readTree(queryJson),
            sort = Option(sortJson).filter(_.nonEmpty)
              .map(mapper.readTree),
            batchSize = batchSize)
        case "aggregate" =>
          c.aggregate(collection,
            mapper.readTree(queryJson).elements().asScala.toSeq)
        case other => throw new IllegalArgumentException(
          s"mongodb input operation: $other")
      }
      val rows = docs.zipWithIndex.map { case (d, i) =>
        Row(d.toString, Map(
          "mongodb_database" -> database,
          "mongodb_collection" -> collection), null, i.toLong)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows,
          math.max(1, math.min(math.max(rows.size, 1),
            spark.sparkContext.defaultParallelism))), BrokerStream.schema)
    } finally c.close()
  }

  /** `mongodb` OUTPUT (output.go): per-row operation executed over one
    * connection per partition. The document/filter/update come from
    * the row's value: insert-one takes the value as the document;
    * delete/update/replace take `{"filter": ..., "document": ...}`
    * envelopes (the output's document_map/filter_map results).
    */
  def write(df: DataFrame, url: String, database: String,
            collection: String, operation: String = "insert-one",
            upsert: Boolean = false, valueCol: String = "value"): Unit = {
    val vIdx = df.schema.fieldIndex(valueCol)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = clientFor(url, database)
        try it.foreach { r =>
          val m = Shared.mapper
          val v = m.readTree(r.getString(vIdx))
          operation match {
            case "insert-one" => c.insert(collection, Seq(v))
            case "delete-one" =>
              c.delete(collection, v.path("filter"), limit = 1)
            case "delete-many" =>
              c.delete(collection, v.path("filter"), limit = 0)
            case "replace-one" =>
              c.update(collection, v.path("filter"), v.path("document"),
                upsert = upsert)
            case "update-one" =>
              c.update(collection, v.path("filter"), v.path("document"),
                upsert = upsert)
            case other => throw new IllegalArgumentException(
              s"mongodb output operation: $other")
          }
          ()
        } finally c.close()
      }
    }
  }

  // ─────────────────────────── server ───────────────────────────

  /** Loopback mongod-shaped server: real sockets, OP_MSG conversation,
    * in-memory collections. Query operators: equality, $eq/$ne/$gt/
    * $gte/$lt/$lte/$in; updates: $set/$inc or whole-document replace;
    * find cursors page by batchSize through getMore; aggregate
    * supports $match/$sort/$limit/$project (the documented subset —
    * enough for every reference operation shape).
    */
  final class Server {
    private val colls = TrieMap.empty[String, Vector[ObjectNode]]
    private final case class Cursor(docs: Vector[JsonNode], var pos: Int)
    private val cursors = TrieMap.empty[Long, Cursor]
    private val cursorIds = new java.util.concurrent.atomic.AtomicLong(1000)

    // ── change-stream oplog (mongodb_cdc): every post-seed mutation
    // appends one event with a monotonically increasing resume token;
    // $changeStream cursors replay from a token and stay open ──
    private val oplog = scala.collection.mutable.ArrayBuffer.empty[ObjectNode]
    private val opSeq = new java.util.concurrent.atomic.AtomicLong(0)
    private final case class StreamCursor(db: String, coll: String,
                                          var afterSeq: Long)
    private val streamCursors = TrieMap.empty[Long, StreamCursor]

    private def hexToken(seq: Long): ObjectNode = {
      val t = mapper.createObjectNode(); t.put("_data", f"$seq%016x"); t
    }

    private def recordEvent(db: String, coll: String, op: String,
                            key: JsonNode, full: Option[JsonNode]): Unit =
      // seq allocation and the append happen under ONE oplog lock:
      // drainStream advances a cursor to opSeq.get when a batch comes
      // up short, so a seq allocated outside the lock but not yet
      // appended would be skipped forever — a lost CDC event
      oplog.synchronized {
        val seq = opSeq.incrementAndGet()
        val e = mapper.createObjectNode()
        e.set[JsonNode]("_id", hexToken(seq))
        e.put("operationType", op)
        e.put("clusterTime", seq)
        val ns = e.putObject("ns"); ns.put("db", db); ns.put("coll", coll)
        if (key != null) {
          val dk = e.putObject("documentKey")
          dk.set[JsonNode]("_id", key)
          ()
        }
        full.foreach(f => { e.set[JsonNode]("fullDocument", f); () })
        oplog += e
        ()
      }

    /** Next batch for a change-stream cursor; advances the cursor past
      * everything scanned (matched or not) so the post-batch resume
      * token always moves forward, like a real server's PBRT.
      */
    private def drainStream(sc: StreamCursor,
                            batchSize: Int): Vector[ObjectNode] =
      oplog.synchronized {
        val evs = oplog.iterator
          .filter(e => e.get("clusterTime").asLong > sc.afterSeq)
          .filter(e => e.at("/ns/db").asText == sc.db &&
            (sc.coll == "*" || e.at("/ns/coll").asText == sc.coll))
          .take(batchSize).toVector
        sc.afterSeq =
          if (evs.size == batchSize) evs.last.get("clusterTime").asLong
          else opSeq.get
        evs
      }

    private def streamCursorResponse(id: Long, sc: StreamCursor,
                                     batch: Vector[ObjectNode],
                                     field: String): ObjectNode = {
      val c = mapper.createObjectNode()
      c.put("id", id) // change-stream cursors never close on their own
      c.put("ns", s"${sc.db}.${sc.coll}")
      val arr = c.putArray(field)
      batch.foreach(d => { arr.add(d); () })
      c.set[JsonNode]("postBatchResumeToken", hexToken(sc.afterSeq))
      ok("cursor" -> c)
    }

    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    @volatile private var running = true
    def port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val t = new Thread(() => serve(s), "mongo-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Exception => () }
      }
    }, "mongo-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    def stop(): Unit = {
      running = false
      try server.close() catch { case _: Exception => () }
    }

    /** Documents currently in a collection (for assertions). */
    def docs(database: String, coll: String): Vector[ObjectNode] =
      colls.getOrElse(s"$database.$coll", Vector.empty)

    def seed(database: String, coll: String, ds: Seq[String]): Unit = {
      colls(s"$database.$coll") =
        ds.map(s => mapper.readTree(s).asInstanceOf[ObjectNode]).toVector
      ()
    }

    private def serve(socket: Socket): Unit = {
      try {
        val in = new BufferedInputStream(socket.getInputStream)
        val out = new BufferedOutputStream(socket.getOutputStream)
        while (true) {
          val (reqId, cmd) = readOpMsg(in)
          val resp = handle(cmd)
          writeOpMsg(out, resp, responseTo = reqId)
        }
      } catch {
        case _: EOFException | _: java.net.SocketException => ()
        case e: Exception =>
          System.err.println(s"[mongo-fake] ${e.getMessage}")
      } finally {
        try socket.close() catch { case _: Exception => () }
      }
    }

    private def ok(extra: (String, JsonNode)*): ObjectNode = {
      val o = mapper.createObjectNode()
      extra.foreach { case (k, v) => o.set[JsonNode](k, v); () }
      o.put("ok", 1.0)
      o
    }
    private def err(msg: String): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("ok", 0.0); o.put("errmsg", msg)
      o
    }
    private def num(v: Int) = mapper.getNodeFactory.numberNode(v)

    private def handle(cmd: ObjectNode): ObjectNode = {
      val db = cmd.path("$db").asText("test")
      val first = cmd.properties().asScala.headOption
        .map(_.getKey).getOrElse("")
      first match {
        case "hello" | "isMaster" =>
          ok("maxWireVersion" -> num(17), "minWireVersion" -> num(0))
        case "ping" => ok()
        case "insert" =>
          val collName = cmd.get("insert").asText
          val key = s"$db.$collName"
          val docs = cmd.path("documents").elements().asScala
            .map(withId).toVector
          colls.synchronized {
            colls(key) = colls.getOrElse(key, Vector.empty) ++ docs
          }
          docs.foreach(d =>
            recordEvent(db, collName, "insert", d.get("_id"), Some(d)))
          ok("n" -> num(docs.size))
        case "find" =>
          val key = s"$db.${cmd.get("find").asText}"
          var docs: Vector[JsonNode] =
            colls.getOrElse(key, Vector.empty)
              .filter(matches(_, cmd.path("filter")))
          Option(cmd.get("sort")).foreach(s => docs = sortDocs(docs, s))
          val limit = cmd.path("limit").asInt(0)
          if (limit > 0) docs = docs.take(limit)
          respondCursor(key, docs, cmd.path("batchSize").asInt(101),
            "firstBatch")
        case "getMore" =>
          val id = cmd.get("getMore").asLong
          streamCursors.get(id) match {
            case Some(sc) =>
              return streamCursorResponse(id, sc,
                drainStream(sc, cmd.path("batchSize").asInt(101)), "nextBatch")
            case None => ()
          }
          cursors.get(id) match {
            case None => err(s"cursor id $id not found")
            case Some(cur) => cur.synchronized {
              val batch = cur.docs.slice(cur.pos,
                cur.pos + cmd.path("batchSize").asInt(101))
              cur.pos += batch.size
              val done = cur.pos >= cur.docs.size
              if (done) cursors.remove(id)
              val c = mapper.createObjectNode()
              c.put("id", if (done) 0L else id)
              val arr = c.putArray("nextBatch")
              batch.foreach(d => { arr.add(d); () })
              ok("cursor" -> c)
            }
          }
        case "update" =>
          val collName = cmd.get("update").asText
          val key = s"$db.$collName"
          var n = 0; var modified = 0; var upserted = 0
          colls.synchronized {
            var cur = colls.getOrElse(key, Vector.empty)
            cmd.path("updates").elements().asScala.foreach { u =>
              val q = u.path("q")
              val newDoc = u.path("u")
              val multi = u.path("multi").asBoolean(false)
              // whole-document replace (no $-operators) → "replace"
              val isReplace = !newDoc.properties().asScala
                .exists(_.getKey.startsWith("$"))
              val idxs = cur.zipWithIndex
                .filter { case (d, _) => matches(d, q) }
                .map(_._2)
              val hit = if (multi) idxs else idxs.take(1)
              if (hit.isEmpty && u.path("upsert").asBoolean(false)) {
                val nd = withId(applyUpdate(mapper.createObjectNode(), newDoc))
                cur = cur :+ nd
                recordEvent(db, collName, "insert", nd.get("_id"), Some(nd))
                n += 1; upserted += 1
              } else hit.foreach { i =>
                val nd = applyUpdate(cur(i), newDoc)
                cur = cur.updated(i, nd)
                // update_lookup document mode: post-image attached
                recordEvent(db, collName,
                  if (isReplace) "replace" else "update",
                  nd.get("_id"), Some(nd))
                n += 1; modified += 1
              }
            }
            colls(key) = cur
          }
          ok("n" -> num(n), "nModified" -> num(modified))
        case "delete" =>
          val collName = cmd.get("delete").asText
          val key = s"$db.$collName"
          var n = 0
          colls.synchronized {
            var cur = colls.getOrElse(key, Vector.empty)
            cmd.path("deletes").elements().asScala.foreach { d =>
              val q = d.path("q")
              val limit = d.path("limit").asInt(0)
              val (hit, keep) = cur.partition(matches(_, q))
              val removed = if (limit == 1) hit.take(1) else hit
              removed.foreach(r =>
                recordEvent(db, collName, "delete", r.get("_id"), None))
              n += removed.size
              cur = keep ++ hit.drop(removed.size)
            }
            colls(key) = cur
          }
          ok("n" -> num(n))
        case "aggregate" =>
          val collName = cmd.get("aggregate").asText
          val key = s"$db.$collName"
          val stages = cmd.path("pipeline").elements().asScala.toVector
          // $changeStream must be the first stage (server-enforced in
          // real mongod too): open a resumable stream cursor
          if (stages.headOption.exists(_.has("$changeStream"))) {
            val cs = stages.head.get("$changeStream")
            val after: Long =
              if (cs.hasNonNull("resumeAfter"))
                java.lang.Long.parseLong(
                  cs.at("/resumeAfter/_data").asText, 16)
              else if (cs.hasNonNull("startAtOperationTime"))
                cs.get("startAtOperationTime").asLong - 1
              else opSeq.get // "now"
            val sc = StreamCursor(db, collName, after)
            val id = cursorIds.incrementAndGet()
            streamCursors(id) = sc
            return streamCursorResponse(id, sc,
              drainStream(sc, cmd.path("batchSize").asInt(101)), "firstBatch")
          }
          var docs: Vector[JsonNode] = colls.getOrElse(key, Vector.empty)
          stages.foreach { stage =>
            val op = stage.properties().asScala.head.getKey
            op match {
              case "$match" =>
                docs = docs.filter(matches(_, stage.get("$match")))
              case "$sort" => docs = sortDocs(docs, stage.get("$sort"))
              case "$limit" => docs = docs.take(stage.get("$limit").asInt)
              case "$project" =>
                val proj = stage.get("$project")
                docs = docs.map { d =>
                  val o = mapper.createObjectNode()
                  proj.properties().asScala.foreach { e =>
                    if (e.getValue.asInt(0) == 1 && d.has(e.getKey))
                      o.set[JsonNode](e.getKey, d.get(e.getKey))
                  }
                  o
                }
              case "$bucketAuto" =>
                // snapshot_auto_bucket_sharding (cdc/input.go): split
                // the collection into near-equal ranges by the groupBy
                // key. Each bucket reports its own chunk's min/max —
                // exact ranges here since _id values are unique
                val spec = stage.get("$bucketAuto")
                val gb = spec.get("groupBy").asText.stripPrefix("$")
                val nb = math.max(1, spec.get("buckets").asInt)
                val sortSpec = mapper.createObjectNode(); sortSpec.put(gb, 1)
                val sorted = sortDocs(docs, sortSpec)
                val per = math.max(1, (sorted.size + nb - 1) / nb)
                docs = sorted.grouped(per).map { chunk =>
                  val b = mapper.createObjectNode()
                  val bid = b.putObject("_id")
                  bid.set[JsonNode]("min", chunk.head.path(gb))
                  bid.set[JsonNode]("max", chunk.last.path(gb))
                  b.put("count", chunk.size)
                  b: JsonNode
                }.toVector
              case other => return err(s"unsupported stage $other")
            }
          }
          respondCursor(key, docs, Int.MaxValue, "firstBatch")
        case "collStats" =>
          val ds = colls.getOrElse(s"$db.${cmd.get("collStats").asText}",
            Vector.empty)
          ok("size" -> num(ds.map(_.toString.length).sum),
            "count" -> num(ds.size))
        case "drop" =>
          // collection drop invalidates open change streams: the real
          // server emits `drop` then `invalidate` (cdc/input.go handles
          // the invalidate by resetting its resume token)
          val collName = cmd.get("drop").asText
          colls.remove(s"$db.$collName")
          recordEvent(db, collName, "drop", null, None)
          recordEvent(db, collName, "invalidate", null, None)
          ok()
        case other => err(s"no such command: '$other'")
      }
    }

    private def respondCursor(ns: String, docs: Vector[JsonNode],
                              batchSize: Int, field: String): ObjectNode = {
      val first = docs.take(batchSize)
      val c = mapper.createObjectNode()
      if (first.size < docs.size) {
        val id = cursorIds.incrementAndGet()
        cursors(id) = Cursor(docs, first.size)
        c.put("id", id)
      } else c.put("id", 0L)
      c.put("ns", ns)
      val arr = c.putArray(field)
      first.foreach(d => { arr.add(d); () })
      ok("cursor" -> c)
    }

    private def withId(d: JsonNode): ObjectNode = {
      val o = d.deepCopy[ObjectNode]()
      if (!o.has("_id")) {
        val oid = mapper.createObjectNode()
        val bytes = new Array[Byte](12)
        new java.security.SecureRandom().nextBytes(bytes)
        oid.put("$oid", bytes.map(x => f"${x & 0xff}%02x").mkString)
        o.set[JsonNode]("_id", oid)
        ()
      }
      o
    }

    private def applyUpdate(doc: ObjectNode, u: JsonNode): ObjectNode = {
      val hasOps = u.properties().asScala.exists(_.getKey.startsWith("$"))
      if (!hasOps) {
        // whole-document replace keeps _id
        val o = u.deepCopy[ObjectNode]()
        if (doc.has("_id")) { o.set[JsonNode]("_id", doc.get("_id")); () }
        o
      } else {
        val o = doc.deepCopy[ObjectNode]()
        Option(u.get("$set")).foreach(_.properties().asScala.foreach(e =>
          o.set[JsonNode](e.getKey, e.getValue)))
        Option(u.get("$inc")).foreach(_.properties().asScala.foreach { e =>
          val cur = o.path(e.getKey).asDouble(0) + e.getValue.asDouble
          if (cur == cur.toLong.toDouble) o.put(e.getKey, cur.toLong)
          else o.put(e.getKey, cur)
          ()
        })
        o
      }
    }

    private def matches(doc: JsonNode, filter: JsonNode): Boolean = {
      if (filter == null || filter.isMissingNode || filter.isNull ||
          filter.size == 0) return true
      filter.properties().asScala.forall { e =>
        val field = doc.path(e.getKey)
        val cond = e.getValue
        if (cond.isObject &&
            cond.properties().asScala.exists(_.getKey.startsWith("$"))) {
          cond.properties().asScala.forall { c =>
            c.getKey match {
              case "$eq" => jsonEq(field, c.getValue)
              case "$ne" => !jsonEq(field, c.getValue)
              case "$gt" => cmp(field, c.getValue) > 0
              case "$gte" => cmp(field, c.getValue) >= 0
              case "$lt" => cmp(field, c.getValue) < 0
              case "$lte" => cmp(field, c.getValue) <= 0
              case "$in" => c.getValue.elements().asScala
                .exists(jsonEq(field, _))
              case other => throw new IllegalArgumentException(
                s"operator $other")
            }
          }
        } else jsonEq(field, cond)
      }
    }

    private def sortDocs(docs: Vector[JsonNode],
                         spec: JsonNode): Vector[JsonNode] = {
      val keys = spec.properties().asScala
        .map(e => (e.getKey, e.getValue.asInt(1))).toSeq
      docs.sortWith { (a, b) =>
        keys.iterator.map { case (f, dir) =>
          cmp(a.path(f), b.path(f)) * dir
        }.find(_ != 0).exists(_ < 0)
      }
    }

    private def jsonEq(a: JsonNode, b: JsonNode): Boolean =
      if (a.isNumber && b.isNumber) a.asDouble == b.asDouble
      else a == b

    private def cmp(a: JsonNode, b: JsonNode): Int =
      if (a.isNumber && b.isNumber) a.asDouble.compareTo(b.asDouble)
      else if (a.isTextual && b.isTextual) a.asText.compareTo(b.asText)
      else if (a.isMissingNode) -1
      else 0
  }
}
