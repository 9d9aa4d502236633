package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Cassandra over the PUBLIC CQL native protocol v4 (the reference
  * `internal/impl/cassandra` input.go/output.go ride gocql — contract
  * only; the frame formats here follow the protocol spec shipped with
  * Cassandra, `native_protocol_v4.spec`):
  *
  *   - frames: version/flags/stream/opcode/length header, STARTUP →
  *     READY handshake, QUERY with bound values + consistency,
  *     BATCH (logged) with per-statement values, RESULT kinds Void /
  *     Rows (column specs + typed cells), ERROR surfaced loudly;
  *   - typed values: int, bigint, varchar, double, boolean,
  *     timestamp — the big-endian fixed encodings of the spec;
  *   - semantics: INSERT IS AN UPSERT keyed by the table's primary
  *     key (Cassandra's defining write behavior), SELECT with
  *     optional key-equality WHERE.
  *
  * The INPUT runs one SELECT and emits a message per row (input.go);
  * the OUTPUT executes a parameterized query per message with
  * `args` drawn from columns, optionally grouped into LOGGED BATCHES
  * (output.go args_mapping/logged batch contract). One connection per
  * partition, executor-side — no shuffle. Real clusters are
  * env-blocked; `mem://` routes to the in-process [[Cassandra.Server]]
  * speaking the same bytes over a real socket.
  */
object Cassandra {

  // opcodes
  val OpError = 0x00; val OpStartup = 0x01; val OpReady = 0x02
  val OpQuery = 0x07; val OpResult = 0x08; val OpBatch = 0x0d

  // result kinds
  val KindVoid = 1; val KindRows = 2

  // consistency levels (protocol §3)
  val Consistencies: Map[String, Int] = Map(
    "ANY" -> 0, "ONE" -> 1, "TWO" -> 2, "THREE" -> 3, "QUORUM" -> 4,
    "ALL" -> 5, "LOCAL_QUORUM" -> 6, "EACH_QUORUM" -> 7,
    "LOCAL_ONE" -> 10)

  /** Supported CQL types and their option ids (§4.2.5.2). */
  sealed abstract class CqlType(val id: Int, val name: String)
  case object CInt extends CqlType(0x09, "int")
  case object CBigint extends CqlType(0x02, "bigint")
  case object CVarchar extends CqlType(0x0d, "varchar")
  case object CDouble extends CqlType(0x07, "double")
  case object CBoolean extends CqlType(0x04, "boolean")
  case object CTimestamp extends CqlType(0x0b, "timestamp")

  def typeOf(name: String): CqlType = name.toLowerCase match {
    case "int" => CInt
    case "bigint" => CBigint
    case "varchar" | "text" => CVarchar
    case "double" => CDouble
    case "boolean" => CBoolean
    case "timestamp" => CTimestamp
    case other => throw new IllegalArgumentException(s"cql type $other")
  }

  def encodeValue(t: CqlType, v: Any): Array[Byte] = v match {
    case null => null
    case _ => t match {
      case CInt => ByteBuffer.allocate(4)
        .putInt(v.asInstanceOf[Number].intValue).array()
      case CBigint => ByteBuffer.allocate(8)
        .putLong(v.asInstanceOf[Number].longValue).array()
      case CVarchar => v.toString.getBytes(UTF_8)
      case CDouble => ByteBuffer.allocate(8)
        .putDouble(v.asInstanceOf[Number].doubleValue).array()
      case CBoolean =>
        Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
      case CTimestamp => ByteBuffer.allocate(8)
        .putLong(v match {
          case ts: java.sql.Timestamp => ts.getTime
          case ms: Long => ms
          case n: Number => n.longValue
        }).array()
    }
  }

  def decodeValue(t: CqlType, b: Array[Byte]): Any =
    if (b == null) null
    else t match {
      case CInt => ByteBuffer.wrap(b).getInt
      case CBigint => ByteBuffer.wrap(b).getLong
      case CVarchar => new String(b, UTF_8)
      case CDouble => ByteBuffer.wrap(b).getDouble
      case CBoolean => b(0) != 0
      case CTimestamp =>
        new java.sql.Timestamp(ByteBuffer.wrap(b).getLong)
    }

  // ───────────────────────── frame codec ─────────────────────────

  final case class Frame(stream: Int, opcode: Int, body: Array[Byte])

  def writeFrame(out: OutputStream, f: Frame, request: Boolean): Unit = {
    val b = ByteBuffer.allocate(9 + f.body.length)
    b.put((if (request) 0x04 else 0x84).toByte)
    b.put(0.toByte) // flags
    b.putShort(f.stream.toShort)
    b.put(f.opcode.toByte)
    b.putInt(f.body.length)
    b.put(f.body)
    out.write(b.array()); out.flush()
  }

  def readFrame(in: InputStream): Frame = {
    val din = new DataInputStream(in)
    val head = new Array[Byte](9)
    din.readFully(head)
    val hb = ByteBuffer.wrap(head)
    hb.get() // version
    hb.get() // flags
    val stream = hb.getShort.toInt
    val opcode = hb.get() & 0xff
    val len = hb.getInt
    val body = new Array[Byte](len)
    din.readFully(body)
    Frame(stream, opcode, body)
  }

  // body writer helpers (§3 notations)
  final class BodyW {
    val b = new java.io.ByteArrayOutputStream()
    def u8(v: Int): BodyW = { b.write(v); this }
    def u16(v: Int): BodyW = { b.write(v >> 8); b.write(v); this }
    def i32(v: Int): BodyW = { u16(v >>> 16); u16(v & 0xffff); this }
    def str(s: String): BodyW = { // [string]
      val d = s.getBytes(UTF_8); u16(d.length); raw(d)
    }
    def longStr(s: String): BodyW = { // [long string]
      val d = s.getBytes(UTF_8); i32(d.length); raw(d)
    }
    def bytes(d: Array[Byte]): BodyW = // [bytes]
      if (d == null) i32(-1) else { i32(d.length); raw(d) }
    def raw(d: Array[Byte]): BodyW = { b.write(d, 0, d.length); this }
    def array: Array[Byte] = b.toByteArray
  }

  final class BodyR(body: Array[Byte]) {
    val b: ByteBuffer = ByteBuffer.wrap(body)
    def u8(): Int = b.get() & 0xff
    def u16(): Int = b.getShort & 0xffff
    def i32(): Int = b.getInt
    def str(): String = {
      val d = new Array[Byte](u16()); b.get(d); new String(d, UTF_8)
    }
    def longStr(): String = {
      val d = new Array[Byte](i32()); b.get(d); new String(d, UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = i32()
      if (n < 0) null else { val d = new Array[Byte](n); b.get(d); d }
    }
    def hasRemaining: Boolean = b.hasRemaining
  }

  // ───────────────────────── client ─────────────────────────

  final class Client(host: String, port: Int) {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), 10000)
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)

    locally {
      val w = new BodyW().u16(1).str("CQL_VERSION").str("3.0.0")
      writeFrame(out, Frame(0, OpStartup, w.array), request = true)
      val r = readFrame(in)
      require(r.opcode == OpReady, s"cql: startup got opcode ${r.opcode}")
    }

    /** One QUERY with positional values. Returns (columns, rows) for
      * Rows results, empty for Void.
      */
    def query(cql: String, values: Seq[(CqlType, Any)] = Seq.empty,
              consistency: String = "QUORUM")
        : (Vector[(String, CqlType)], Vector[Vector[Any]]) = synchronized {
      val w = new BodyW().longStr(cql)
        .u16(Consistencies(consistency.toUpperCase))
      if (values.isEmpty) w.u8(0)
      else {
        w.u8(0x01) // VALUES flag
        w.u16(values.size)
        values.foreach { case (t, v) => w.bytes(encodeValue(t, v)) }
      }
      writeFrame(out, Frame(1, OpQuery, w.array), request = true)
      readResult()
    }

    /** LOGGED BATCH of the same parameterized statement. */
    def batch(cql: String, rows: Seq[Seq[(CqlType, Any)]],
              consistency: String = "QUORUM"): Unit = synchronized {
      val w = new BodyW().u8(0) // logged
      w.u16(rows.size)
      rows.foreach { values =>
        w.u8(0) // kind: query string
        w.longStr(cql)
        w.u16(values.size)
        values.foreach { case (t, v) => w.bytes(encodeValue(t, v)) }
      }
      w.u16(Consistencies(consistency.toUpperCase))
      w.u8(0) // flags
      writeFrame(out, Frame(2, OpBatch, w.array), request = true)
      readResult()
      ()
    }

    private def readResult()
        : (Vector[(String, CqlType)], Vector[Vector[Any]]) = {
      val f = readFrame(in)
      f.opcode match {
        case OpError =>
          val r = new BodyR(f.body)
          val code = r.i32()
          throw new IllegalStateException(
            f"cql: error 0x$code%04x: ${r.str()}")
        case OpResult =>
          val r = new BodyR(f.body)
          r.i32() match {
            case KindVoid => (Vector.empty, Vector.empty)
            case KindRows =>
              val flags = r.i32()
              val nCols = r.i32()
              val global = (flags & 1) != 0
              if (global) { r.str(); r.str(); () }
              val cols = (0 until nCols).map { _ =>
                if (!global) { r.str(); r.str(); () }
                val name = r.str()
                val tid = r.u16()
                val t = Seq(CInt, CBigint, CVarchar, CDouble, CBoolean,
                  CTimestamp).find(_.id == tid).getOrElse(
                  throw new IllegalArgumentException(s"cql type id $tid"))
                name -> t
              }.toVector
              val nRows = r.i32()
              val rows = (0 until nRows).map { _ =>
                cols.map { case (_, t) => decodeValue(t, r.bytes()) }
                  .toVector
              }.toVector
              (cols, rows)
            case other =>
              throw new IllegalStateException(s"cql: result kind $other")
          }
        case other =>
          throw new IllegalStateException(s"cql: opcode $other")
      }
    }

    def close(): Unit = { try socket.close() catch { case _: Exception => () } }
  }

  private val registry = TrieMap.empty[String, Server]
  def named(name: String): Server =
    registry.getOrElseUpdate(name, new Server)
  def drop(name: String): Unit = registry.remove(name).foreach(_.stop())

  def clientFor(url: String): Client =
    if (url.startsWith("mem://")) {
      val srv = named(url.stripPrefix("mem://"))
      new Client("127.0.0.1", srv.port)
    } else throw new IllegalArgumentException(
      s"cassandra: only mem:// loopback servers exist here (got $url)")

  // ─────────────────────── spark components ───────────────────────

  /** `cassandra` INPUT: one SELECT, one message per row (typed values
    * rendered as JSON; timestamps as ISO instants).
    */
  def read(spark: SparkSession, url: String, query: String): DataFrame = {
    val c = clientFor(url)
    try {
      val (cols, rows) = c.query(query)
      val out = rows.zipWithIndex.map { case (r, i) =>
        val json = cols.zip(r).map { case ((n, _), v) =>
          "\"" + n + "\":" + jsonVal(v)
        }.mkString("{", ",", "}")
        Row(json, Map.empty[String, String], null, i.toLong)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(out,
          math.max(1, math.min(math.max(out.size, 1),
            spark.sparkContext.defaultParallelism))), BrokerStream.schema)
    } finally c.close()
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case ts: java.sql.Timestamp => "\"" + ts.toInstant.toString + "\""
    case b: Boolean => b.toString
    case n => n.toString
  }

  /** `cassandra` OUTPUT: the parameterized `query` per row with args
    * from `argCols` (the args_mapping result), optionally grouped
    * into logged batches. One connection per partition.
    */
  def write(df: DataFrame, url: String, query: String,
            argCols: Seq[(String, String)], // (column, cql type)
            consistency: String = "QUORUM",
            loggedBatch: Boolean = true, batchSize: Int = 64): Unit = {
    val idx = argCols.map { case (col, t) =>
      (df.schema.fieldIndex(col), typeOf(t))
    }
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = clientFor(url)
        try {
          def args(r: Row): Seq[(CqlType, Any)] = idx.map { case (i, t) =>
            (t, if (r.isNullAt(i)) null else r.get(i))
          }
          if (loggedBatch)
            it.grouped(batchSize).foreach(rows =>
              c.batch(query, rows.map(args), consistency))
          else it.foreach(r => { c.query(query, args(r), consistency); () })
        } finally c.close()
      }
    }
  }

  // ─────────────────────────── server ───────────────────────────

  /** Loopback Cassandra-shaped server: CQL v4 frames over real
    * sockets, a registered-schema table store where INSERT IS AN
    * UPSERT on the primary key, and the minimal statement surface the
    * components use: `INSERT INTO ks.t (a,b) VALUES (?,?)` and
    * `SELECT a,b|* FROM ks.t [WHERE key = ?|literal]`.
    */
  final class Server {
    final case class TableDef(cols: Vector[(String, CqlType)],
                              key: Vector[String])
    private val schemas = TrieMap.empty[String, TableDef]
    private val data =
      TrieMap.empty[String, scala.collection.mutable.LinkedHashMap[
        Vector[Any], Vector[Any]]]

    def registerTable(keyspace: String, table: String,
                      cols: Seq[(String, String)],
                      key: Seq[String]): Unit = {
      schemas(s"$keyspace.$table") = TableDef(
        cols.map { case (n, t) => (n, typeOf(t)) }.toVector,
        key.toVector)
      data(s"$keyspace.$table") =
        scala.collection.mutable.LinkedHashMap.empty
      ()
    }

    def rowCount(keyspace: String, table: String): Int = {
      val d = data(s"$keyspace.$table")
      d.synchronized(d.size)
    }

    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    @volatile private var running = true
    def port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val t = new Thread(() => serve(s), "cql-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Exception => () }
      }
    }, "cql-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    def stop(): Unit = {
      running = false
      try server.close() catch { case _: Exception => () }
    }

    private def serve(socket: Socket): Unit = {
      try {
        val in = new BufferedInputStream(socket.getInputStream)
        val out = new BufferedOutputStream(socket.getOutputStream)
        while (true) {
          val f = readFrame(in)
          val resp =
            try handle(f)
            catch {
              case e: Exception =>
                val w = new BodyW().i32(0x2200) // invalid query
                w.str(Option(e.getMessage).getOrElse("error"))
                Frame(f.stream, OpError, w.array)
            }
          writeFrame(out, resp, request = false)
        }
      } catch {
        case _: EOFException | _: java.net.SocketException => ()
      } finally {
        try socket.close() catch { case _: Exception => () }
      }
    }

    private def handle(f: Frame): Frame = f.opcode match {
      case OpStartup => Frame(f.stream, OpReady, Array.empty)
      case OpQuery =>
        val r = new BodyR(f.body)
        val cql = r.longStr()
        r.u16() // consistency
        val flags = r.u8()
        val values =
          if ((flags & 0x01) != 0)
            (0 until r.u16()).map(_ => r.bytes()).toVector
          else Vector.empty
        execute(f.stream, cql, values)
      case OpBatch =>
        val r = new BodyR(f.body)
        r.u8() // batch type
        val n = r.u16()
        (0 until n).foreach { _ =>
          require(r.u8() == 0, "cql fake: only query-string batch kind")
          val cql = r.longStr()
          val values = (0 until r.u16()).map(_ => r.bytes()).toVector
          execute(f.stream, cql, values)
        }
        Frame(f.stream, OpResult, new BodyW().i32(KindVoid).array)
      case other =>
        throw new IllegalArgumentException(s"cql fake: opcode $other")
    }

    private val InsertRx =
      """(?is)\s*INSERT\s+INTO\s+([\w]+)\.([\w]+)\s*\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)\s*""".r
    private val SelectRx =
      """(?is)\s*SELECT\s+(.+?)\s+FROM\s+([\w]+)\.([\w]+)(?:\s+WHERE\s+(\w+)\s*=\s*(\?|\S+))?\s*""".r

    private def execute(stream: Int, cql: String,
                        values: Vector[Array[Byte]]): Frame = cql match {
      case InsertRx(ks, tbl, colList, valList) =>
        val key = s"$ks.$tbl"
        val td = schemas.getOrElse(key,
          throw new IllegalArgumentException(s"unconfigured table $key"))
        val names = colList.split(",").map(_.trim.toLowerCase).toVector
        val placeholders = valList.split(",").map(_.trim).toVector
        require(placeholders.forall(_ == "?"),
          "cql fake: INSERT values must be bound placeholders")
        require(values.size == names.size,
          s"cql fake: ${names.size} columns, ${values.size} values")
        val typed = names.zip(values).map { case (n, raw) =>
          val t = td.cols.find(_._1 == n).getOrElse(
            throw new IllegalArgumentException(s"unknown column $n"))._2
          n -> decodeValue(t, raw)
        }.toMap
        // full row in table column order; unbound columns null
        val row = td.cols.map { case (n, _) => typed.getOrElse(n, null) }
        val pk = td.key.map(k => typed.getOrElse(k,
          throw new IllegalArgumentException(s"INSERT missing key $k")))
        val d = data(key)
        d.synchronized { d(pk) = row } // INSERT IS AN UPSERT
        Frame(stream, OpResult, new BodyW().i32(KindVoid).array)
      case SelectRx(proj, ks, tbl, whereCol, whereVal) =>
        val key = s"$ks.$tbl"
        val td = schemas.getOrElse(key,
          throw new IllegalArgumentException(s"unconfigured table $key"))
        val selected: Vector[(String, CqlType)] =
          if (proj.trim == "*") td.cols
          else proj.split(",").map(_.trim.toLowerCase).toVector.map(n =>
            td.cols.find(_._1 == n).getOrElse(
              throw new IllegalArgumentException(s"unknown column $n")))
        val d = data(key)
        val all = d.synchronized(d.values.toVector)
        val filtered = Option(whereCol) match {
          case None => all
          case Some(colName) =>
            val ci = td.cols.indexWhere(_._1 == colName.toLowerCase)
            require(ci >= 0, s"unknown column $colName")
            val t = td.cols(ci)._2
            val target =
              if (whereVal == "?") decodeValue(t, values.head)
              else parseLiteral(t, whereVal)
            all.filter(r => r(ci) == target)
        }
        val w = new BodyW().i32(KindRows)
        w.i32(1) // flags: global table spec
        w.i32(selected.size)
        w.str(ks); w.str(tbl)
        selected.foreach { case (n, t) => w.str(n); w.u16(t.id) }
        w.i32(filtered.size)
        filtered.foreach { r =>
          selected.foreach { case (n, t) =>
            val ci = td.cols.indexWhere(_._1 == n)
            w.bytes(encodeValue(t, r(ci)))
          }
        }
        Frame(stream, OpResult, w.array)
      case other =>
        throw new IllegalArgumentException(
          s"cql fake: unsupported statement: ${other.take(80)}")
    }

    private def parseLiteral(t: CqlType, s: String): Any = t match {
      case CInt => s.toInt
      case CBigint => s.toLong
      case CDouble => s.toDouble
      case CBoolean => s.toBoolean
      case CVarchar => s.stripPrefix("'").stripSuffix("'")
      case CTimestamp => new java.sql.Timestamp(s.toLong)
    }
  }
}
