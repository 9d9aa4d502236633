package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** AMQP 1.0 (`amqp_1` input/output — reference internal/impl/amqp1
  * rides the go-amqp client; this implements the PUBLIC OASIS AMQP
  * 1.0 wire protocol on real TCP sockets, the zmq4/nanomsg/Bolt
  * playbook):
  *
  *  - protocol headers `AMQP\x00 1.0.0` / `AMQP\x03 1.0.0` with an
  *    optional SASL PLAIN layer (mechanisms → init → outcome, then
  *    the connection restarts on the AMQP header)
  *  - the §1.6 type system: described types, compact encodings
  *    (null/bool/uint0/smalluint/ulong variants, str8/32, sym8/32,
  *    bin8/32, list0/8/32, map8/32, array8/32)
  *  - the §2.7 performatives open/begin/attach/flow/transfer/
  *    disposition/detach/end/close with source/target nodes
  *  - §3.2 message sections: properties (0x73), application-
  *    properties (0x74), data (0x75)
  *  - link flow control: a receiver grants `link-credit`, the peer
  *    transfers at most that many deliveries; unsettled transfers are
  *    settled by `disposition accepted` (at-least-once — the broker
  *    redelivers unacked messages to the next receiver)
  *
  * Scale shape: the OUTPUT opens one connection per partition and
  * transfers executor-side; the INPUT drains one link (credit-batch
  * loop, driver admission like every single-connection source) and
  * parallelizes the decoded messages.
  */
object Amqp1 {

  // ─────────────────────── §1.6 type system ───────────────────────

  sealed trait AVal
  case object ANull extends AVal
  final case class ABool(b: Boolean) extends AVal
  final case class AUInt(v: Long) extends AVal
  final case class AULong(v: Long) extends AVal
  final case class AInt(v: Long) extends AVal
  final case class AStr(s: String) extends AVal
  final case class ASym(s: String) extends AVal
  final case class ABin(b: Array[Byte]) extends AVal
  final case class AList(items: Seq[AVal]) extends AVal
  final case class AMapV(entries: Seq[(AVal, AVal)]) extends AVal
  final case class AArray(items: Seq[AVal]) extends AVal
  final case class ADesc(descriptor: AVal, value: AVal) extends AVal

  def encode(v: AVal): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeVal(out, v)
    out.toByteArray
  }

  private def writeVal(o: java.io.ByteArrayOutputStream, v: AVal): Unit =
    v match {
      case ANull => o.write(0x40)
      case ABool(true) => o.write(0x41)
      case ABool(false) => o.write(0x42)
      case AUInt(0) => o.write(0x43)
      case AUInt(x) if x < 0 || x > 0xffffffffL =>
        // silent truncation here corrupted delivery ids — reject
        throw new IllegalArgumentException(s"amqp1: uint out of range: $x")
      case AUInt(x) if x < 256 => o.write(0x52); o.write(x.toInt)
      case AUInt(x) => o.write(0x70); writeI32(o, x.toInt)
      case AULong(0) => o.write(0x44)
      case AULong(x) if x >= 0 && x < 256 => o.write(0x53); o.write(x.toInt)
      case AULong(x) => o.write(0x80); writeI64(o, x)
      case AInt(x) if x >= -128 && x < 128 => o.write(0x54); o.write(x.toInt)
      case AInt(x) if x >= Int.MinValue && x <= Int.MaxValue =>
        o.write(0x71); writeI32(o, x.toInt)
      case AInt(x) => o.write(0x81); writeI64(o, x) // long encoding
      case AStr(s) => writeVar(o, s.getBytes(UTF_8), 0xa1, 0xb1)
      case ASym(s) => writeVar(o, s.getBytes(UTF_8), 0xa3, 0xb3)
      case ABin(b) => writeVar(o, b, 0xa0, 0xb0)
      case AList(Nil) => o.write(0x45)
      case AList(items) =>
        val body = new java.io.ByteArrayOutputStream()
        items.foreach(writeVal(body, _))
        writeCompound(o, body.toByteArray, items.size, 0xc0, 0xd0)
      case AMapV(entries) =>
        val body = new java.io.ByteArrayOutputStream()
        entries.foreach { case (k, v2) =>
          writeVal(body, k); writeVal(body, v2)
        }
        writeCompound(o, body.toByteArray, entries.size * 2, 0xc1, 0xd1)
      case AArray(items) =>
        // one shared constructor then size-prefixed element bodies;
        // our arrays are symbol arrays (sasl mechanisms) → sym8
        val payload = new java.io.ByteArrayOutputStream()
        payload.write(0xa3)
        items.foreach {
          case ASym(s) =>
            val b = s.getBytes(UTF_8)
            payload.write(b.length); payload.write(b)
          case other => throw new IllegalArgumentException(s"array of $other")
        }
        writeCompound(o, payload.toByteArray, items.size, 0xe0, 0xf0)
      case ADesc(d, value) =>
        o.write(0x00); writeVal(o, d); writeVal(o, value)
    }

  private def writeVar(o: java.io.ByteArrayOutputStream, b: Array[Byte],
                       small: Int, big: Int): Unit =
    if (b.length < 256) { o.write(small); o.write(b.length); o.write(b) }
    else { o.write(big); writeI32(o, b.length); o.write(b) }

  private def writeCompound(o: java.io.ByteArrayOutputStream,
                            body: Array[Byte], count: Int,
                            small: Int, big: Int): Unit =
    if (body.length + 1 < 256 && count < 256) {
      o.write(small); o.write(body.length + 1); o.write(count); o.write(body)
    } else {
      o.write(big); writeI32(o, body.length + 4); writeI32(o, count)
      o.write(body)
    }

  private def writeI32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v >>> 24); o.write(v >>> 16); o.write(v >>> 8); o.write(v)
  }
  private def writeI64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeI32(o, (v >>> 32).toInt); writeI32(o, v.toInt)
  }

  final class Decoder(buf: ByteBuffer) {
    def this(b: Array[Byte]) = this(ByteBuffer.wrap(b))
    def hasNext: Boolean = buf.hasRemaining
    def read(): AVal = {
      val c = buf.get() & 0xff
      c match {
        case 0x00 =>
          val d = read(); ADesc(d, read())
        case 0x40 => ANull
        case 0x41 => ABool(true)
        case 0x42 => ABool(false)
        case 0x43 => AUInt(0)
        case 0x44 => AULong(0)
        case 0x50 => AUInt(buf.get() & 0xff) // ubyte folded to uint
        case 0x52 => AUInt(buf.get() & 0xff)
        case 0x53 => AULong(buf.get() & 0xff)
        case 0x54 => AInt(buf.get().toLong)
        case 0x55 => AInt(buf.get().toLong) // smalllong
        case 0x60 => AUInt(buf.getShort & 0xffff)
        case 0x70 => AUInt(buf.getInt & 0xffffffffL)
        case 0x71 => AInt(buf.getInt.toLong)
        case 0x80 => AULong(buf.getLong)
        case 0x81 => AInt(buf.getLong)
        case 0x83 => AULong(buf.getLong) // timestamp as millis
        case 0xa0 => ABin(bytes(buf.get() & 0xff))
        case 0xb0 => ABin(bytes(buf.getInt))
        case 0xa1 => AStr(new String(bytes(buf.get() & 0xff), UTF_8))
        case 0xb1 => AStr(new String(bytes(buf.getInt), UTF_8))
        case 0xa3 => ASym(new String(bytes(buf.get() & 0xff), UTF_8))
        case 0xb3 => ASym(new String(bytes(buf.getInt), UTF_8))
        case 0x45 => AList(Nil)
        case 0xc0 => readList(buf.get() & 0xff)
        case 0xd0 => readList32()
        case 0xc1 => readMap(buf.get() & 0xff)
        case 0xd1 => readMap32()
        case 0xe0 => readArray(buf.get() & 0xff, buf.get() & 0xff)
        case 0xf0 => readArray(buf.getInt, buf.getInt)
        case other => throw new IllegalArgumentException(
          f"amqp1: unsupported constructor 0x$other%02x")
      }
    }
    private def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); buf.get(b); b
    }
    private def readList(size: Int): AVal = {
      val count = buf.get() & 0xff
      AList((0 until count).map(_ => read()))
    }
    private def readList32(): AVal = {
      buf.getInt // size
      val count = buf.getInt
      AList((0 until count).map(_ => read()))
    }
    private def readMap(size: Int): AVal = {
      val count = buf.get() & 0xff
      AMapV((0 until count / 2).map(_ => (read(), read())))
    }
    private def readMap32(): AVal = {
      buf.getInt
      val count = buf.getInt
      AMapV((0 until count / 2).map(_ => (read(), read())))
    }
    private def readArray(size: Int, count: Int): AVal = {
      val ctor = buf.get() & 0xff
      require(ctor == 0xa3, f"amqp1: array ctor 0x$ctor%02x")
      AArray((0 until count).map { _ =>
        ASym(new String(bytes(buf.get() & 0xff), UTF_8))
      })
    }
  }

  // ───────────────────────── §2.3 framing ─────────────────────────

  val AmqpHeader: Array[Byte] =
    Array[Byte]('A', 'M', 'Q', 'P', 0, 1, 0, 0)
  val SaslHeader: Array[Byte] =
    Array[Byte]('A', 'M', 'Q', 'P', 3, 1, 0, 0)

  /** One frame: performative + trailing payload bytes (sections). */
  final case class Frame(frameType: Int, channel: Int,
                         performative: Option[AVal],
                         payload: Array[Byte])

  def writeFrame(out: OutputStream, f: Frame): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    f.performative.foreach(p => body.write(encode(p)))
    body.write(f.payload)
    val size = 8 + body.size()
    val head = ByteBuffer.allocate(8)
    head.putInt(size)
    head.put(2.toByte) // doff
    head.put(f.frameType.toByte)
    head.putShort(f.channel.toShort)
    out.write(head.array())
    body.writeTo(out)
    out.flush()
  }

  def readFrame(in: InputStream): Frame = {
    val head = new Array[Byte](8)
    new DataInputStream(in).readFully(head)
    val hb = ByteBuffer.wrap(head)
    val size = hb.getInt
    val doff = hb.get() & 0xff
    val ftype = hb.get() & 0xff
    val channel = hb.getShort & 0xffff
    val rest = new Array[Byte](size - 8)
    new DataInputStream(in).readFully(rest)
    val body = rest.drop((doff - 2) * 4)
    if (body.isEmpty) Frame(ftype, channel, None, Array.empty)
    else {
      val buf = ByteBuffer.wrap(body)
      val dec = new Decoder(buf)
      val perf = dec.read()
      val payload = new Array[Byte](buf.remaining())
      buf.get(payload)
      Frame(ftype, channel, Some(perf), payload)
    }
  }

  // performative codes (§2.7) and section/state descriptors
  val COpen = 0x10L; val CBegin = 0x11L; val CAttach = 0x12L
  val CFlow = 0x13L; val CTransfer = 0x14L; val CDisposition = 0x15L
  val CDetach = 0x16L; val CEnd = 0x17L; val CClose = 0x18L
  val CSource = 0x28L; val CTarget = 0x29L
  val CAccepted = 0x24L
  val CSaslMechs = 0x40L; val CSaslInit = 0x41L; val CSaslOutcome = 0x44L
  val CProps = 0x73L; val CAppProps = 0x74L; val CData = 0x75L

  def perf(code: Long, fields: AVal*): AVal =
    ADesc(AULong(code), AList(fields.toSeq))

  def codeOf(v: AVal): Long = v match {
    case ADesc(AULong(c), _) => c
    case _ => -1L
  }
  def fieldsOf(v: AVal): Seq[AVal] = v match {
    case ADesc(_, AList(items)) => items
    case _ => Nil
  }
  private def fieldAt(fs: Seq[AVal], i: Int): AVal =
    if (i < fs.size) fs(i) else ANull

  // ─────────────────────── message sections ───────────────────────

  final case class Message(body: Array[Byte], messageId: String = null,
                           appProps: Map[String, String] = Map.empty)

  def encodeMessage(m: Message): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (m.messageId != null)
      out.write(encode(ADesc(AULong(CProps),
        AList(Seq(AStr(m.messageId))))))
    if (m.appProps.nonEmpty)
      out.write(encode(ADesc(AULong(CAppProps),
        AMapV(m.appProps.toSeq.map { case (k, v) => (AStr(k), AStr(v)) }))))
    out.write(encode(ADesc(AULong(CData), ABin(m.body))))
    out.toByteArray
  }

  def decodeMessage(payload: Array[Byte]): Message = {
    val dec = new Decoder(payload)
    var body: Array[Byte] = Array.empty
    var mid: String = null
    var props = Map.empty[String, String]
    while (dec.hasNext) dec.read() match {
      case ADesc(AULong(CData), ABin(b)) => body = b
      case ADesc(AULong(CProps), AList(items)) =>
        items.headOption.foreach {
          case AStr(s) => mid = s
          case _ => ()
        }
      case ADesc(AULong(CAppProps), AMapV(entries)) =>
        props = entries.collect {
          case (AStr(k), AStr(v)) => k -> v
          case (ASym(k), AStr(v)) => k -> v
        }.toMap
      case ADesc(AULong(0x77), ABin(b)) => body = b // amqp-value binary
      case ADesc(AULong(0x77), AStr(s)) => body = s.getBytes(UTF_8)
      case _ => () // header/annotations/footer skipped
    }
    Message(body, mid, props)
  }

  // ───────────────────────────── client ─────────────────────────────

  /** One AMQP 1.0 connection: header (SASL PLAIN when credentials are
    * given) → open → begin; then [[sendAll]] / [[receive]].
    */
  final class Client(host: String, port: Int, user: String = null,
                     pass: String = null) {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), 5000)
    socket.setTcpNoDelay(true)
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private var nextHandle = 0L
    private var deliveryId = 0L

    // ── SASL layer ──
    if (user != null) {
      out.write(SaslHeader); out.flush()
      expectHeader(SaslHeader)
      val mechs = readFrame(in) // sasl-mechanisms
      require(codeOf(mechs.performative.get) == CSaslMechs,
        "amqp1: expected sasl-mechanisms")
      val resp = Array[Byte](0) ++ user.getBytes(UTF_8) ++
        Array[Byte](0) ++ pass.getBytes(UTF_8)
      writeFrame(out, Frame(1, 0, Some(perf(CSaslInit,
        ASym("PLAIN"), ABin(resp))), Array.empty))
      val outcome = readFrame(in)
      require(codeOf(outcome.performative.get) == CSaslOutcome,
        "amqp1: expected sasl-outcome")
      fieldsOf(outcome.performative.get).headOption match {
        case Some(AUInt(0)) => ()
        case other => throw new IllegalStateException(
          s"amqp1: sasl outcome $other (auth failed)")
      }
    }
    // ── AMQP layer ──
    out.write(AmqpHeader); out.flush()
    expectHeader(AmqpHeader)
    writeFrame(out, Frame(0, 0, Some(perf(COpen,
      AStr("graft-" + java.util.UUID.randomUUID.toString.take(8)),
      AStr(host))), Array.empty))
    require(codeOf(readFrame(in).performative.get) == COpen, "amqp1: open")
    writeFrame(out, Frame(0, 0, Some(perf(CBegin,
      ANull, AUInt(0), AUInt(1024), AUInt(1024))), Array.empty))
    require(codeOf(readFrame(in).performative.get) == CBegin, "amqp1: begin")

    private def expectHeader(h: Array[Byte]): Unit = {
      val got = new Array[Byte](8)
      new DataInputStream(in).readFully(got)
      require(got.sameElements(h), "amqp1: protocol header mismatch")
    }

    private def attach(address: String, receiver: Boolean): Long = {
      val handle = nextHandle; nextHandle += 1
      val source =
        if (receiver) ADesc(AULong(CSource), AList(Seq(AStr(address))))
        else ANull
      val target =
        if (receiver) ANull
        else ADesc(AULong(CTarget), AList(Seq(AStr(address))))
      writeFrame(out, Frame(0, 0, Some(perf(CAttach,
        AStr(s"link-$handle"), AUInt(handle), ABool(receiver),
        ANull, ANull, source, target)), Array.empty))
      require(codeOf(readFrame(in).performative.get) == CAttach,
        "amqp1: attach echo")
      handle
    }

    /** Sender link: transfer every message unsettled, then wait for
      * the broker's accepted dispositions.
      */
    def sendAll(address: String, msgs: Seq[Message]): Unit = {
      val handle = attach(address, receiver = false)
      // broker grants credit before we may transfer
      var credit = 0L
      while (credit <= 0) {
        val f = readFrame(in)
        codeOf(f.performative.get) match {
          case CFlow =>
            credit = fieldsOf(f.performative.get)(6) match {
              case AUInt(c) => c
              case _ => 0L
            }
          case other => throw new IllegalStateException(
            s"amqp1: waiting for flow, got $other")
        }
      }
      val first = deliveryId
      msgs.foreach { m =>
        val id = deliveryId; deliveryId += 1
        writeFrame(out, Frame(0, 0, Some(perf(CTransfer,
          AUInt(handle), AUInt(id),
          ABin(ByteBuffer.allocate(8).putLong(id).array()),
          AUInt(0), ABool(false))), encodeMessage(m)))
      }
      // settlement: dispositions must cover [first, last]
      var settled = 0
      while (settled < msgs.size) {
        val f = readFrame(in)
        codeOf(f.performative.get) match {
          case CDisposition =>
            val fs = fieldsOf(f.performative.get)
            val lo = fs(1) match { case AUInt(v) => v; case _ => 0L }
            val hi = fieldAt(fs, 2) match {
              case AUInt(v) => v; case _ => lo
            }
            fieldAt(fs, 4) match {
              case ADesc(AULong(CAccepted), _) | ANull => ()
              case other => throw new IllegalStateException(
                s"amqp1: delivery rejected: $other")
            }
            settled += (hi - math.max(lo, first) + 1).toInt
          case CFlow => () // credit top-ups
          case other => throw new IllegalStateException(
            s"amqp1: waiting for disposition, got $other")
        }
      }
      writeFrame(out, Frame(0, 0, Some(perf(CDetach,
        AUInt(handle), ABool(true))), Array.empty))
      require(codeOf(readFrame(in).performative.get) == CDetach,
        "amqp1: detach echo")
    }

    /** Receiver link: grant `credit`, read transfers until the broker
      * drains or credit is used, settle each with accepted.
      */
    def receive(address: String, credit: Int,
                settle: Boolean = true): Seq[Message] = {
      val handle = attach(address, receiver = true)
      writeFrame(out, Frame(0, 0, Some(perf(CFlow,
        ANull, AUInt(1024), AUInt(0), AUInt(1024),
        AUInt(handle), AUInt(0), AUInt(credit.toLong),
        ANull, ANull, ABool(true))), Array.empty)) // drain=true
      val got = mutable.Buffer[(Long, Message)]()
      var draining = true
      while (draining) {
        val f = readFrame(in)
        codeOf(f.performative.get) match {
          case CTransfer =>
            val fs = fieldsOf(f.performative.get)
            val id = fs(1) match { case AUInt(v) => v; case _ => 0L }
            got += ((id, decodeMessage(f.payload)))
            if (got.size >= credit) draining = false
          case CFlow => draining = false // drained: credit exhausted
          case other => throw new IllegalStateException(
            s"amqp1: receive got $other")
        }
      }
      if (settle && got.nonEmpty)
        writeFrame(out, Frame(0, 0, Some(perf(CDisposition,
          ABool(true), AUInt(got.head._1), AUInt(got.last._1),
          ABool(true), ADesc(AULong(CAccepted), AList(Nil)))),
          Array.empty))
      writeFrame(out, Frame(0, 0, Some(perf(CDetach,
        AUInt(handle), ABool(true))), Array.empty))
      var detached = false
      while (!detached) {
        val f = readFrame(in)
        if (codeOf(f.performative.get) == CDetach) detached = true
      }
      got.map(_._2).toSeq
    }

    def close(): Unit = {
      try {
        writeFrame(out, Frame(0, 0, Some(perf(CEnd)), Array.empty))
        writeFrame(out, Frame(0, 0, Some(perf(CClose)), Array.empty))
      } catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
  }

  // ───────────────────────────── broker ─────────────────────────────

  /** Loopback AMQP 1.0 broker on a real socket: SASL PLAIN enforced
    * when credentials are configured, per-link flow control, queues
    * with at-least-once redelivery (unsettled deliveries return to
    * the queue on detach).
    */
  final class Server(user: String = null, pass: String = null) {
    private val queues =
      TrieMap.empty[String, mutable.Queue[Message]]
    @volatile var rejectedAuth = 0

    def queue(address: String): mutable.Queue[Message] =
      queues.getOrElseUpdate(address, mutable.Queue.empty)

    def depth(address: String): Int = queue(address).synchronized {
      queue(address).size
    }

    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    @volatile private var running = true
    def port: Int = server.getLocalPort
    def stop(): Unit = {
      running = false
      try server.close() catch { case _: Exception => () }
    }

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val t = new Thread(() => serve(s), "amqp1-conn")
          t.setDaemon(true); t.start()
        } catch { case _: Exception => () }
      }
    }, "amqp1-accept")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(socket: Socket): Unit = {
      socket.setTcpNoDelay(true)
      val in = new BufferedInputStream(socket.getInputStream)
      val out = new BufferedOutputStream(socket.getOutputStream)
      try {
        var header = new Array[Byte](8)
        new DataInputStream(in).readFully(header)
        if (header.sameElements(SaslHeader)) {
          out.write(SaslHeader); out.flush()
          writeFrame(out, Frame(1, 0, Some(perf(CSaslMechs,
            AArray(Seq(ASym("PLAIN"))))), Array.empty))
          val init = readFrame(in)
          require(codeOf(init.performative.get) == CSaslInit, "sasl-init")
          val ok = fieldsOf(init.performative.get) match {
            case Seq(ASym("PLAIN"), ABin(resp), _*) =>
              val parts = new String(resp, UTF_8).split("\u0000", -1)
              user == null ||
                (parts.length == 3 && parts(1) == user && parts(2) == pass)
            case _ => false
          }
          writeFrame(out, Frame(1, 0, Some(perf(CSaslOutcome,
            AUInt(if (ok) 0 else 1))), Array.empty))
          if (!ok) { rejectedAuth += 1; socket.close(); return }
          header = new Array[Byte](8)
          new DataInputStream(in).readFully(header)
        } else if (user != null) {
          // credentials configured but the client skipped SASL
          rejectedAuth += 1
          socket.close(); return
        }
        require(header.sameElements(AmqpHeader), "amqp1: header")
        out.write(AmqpHeader); out.flush()

        // link state: handle → (address, receiverRole, in-flight ids)
        val links = mutable.Map[Long, (String, Boolean)]()
        val unsettled = mutable.Map[Long, (String, Message)]()
        // connection-wide monotonic delivery-id (§2.7.5 transfer) — the
        // `unsettled` map is keyed by it, so restarting at 0 per flow
        // frame would overwrite still-unsettled entries and silently
        // drop their redelivery
        var nextDeliveryId = 0L
        var open = true
        while (open) {
          val f = readFrame(in)
          val p = f.performative.getOrElse {
            throw new EOFException("empty frame")
          }
          codeOf(p) match {
            case COpen =>
              writeFrame(out, Frame(0, 0, Some(perf(COpen,
                AStr("graft-broker"))), Array.empty))
            case CBegin =>
              writeFrame(out, Frame(0, f.channel, Some(perf(CBegin,
                AUInt(f.channel.toLong), AUInt(0), AUInt(1024),
                AUInt(1024))), Array.empty))
            case CAttach =>
              val fs = fieldsOf(p)
              val handle = fs(1) match { case AUInt(h) => h; case _ => 0L }
              val clientIsReceiver = fs(2) match {
                case ABool(b) => b; case _ => false
              }
              val address =
                if (clientIsReceiver) fs(5) match {
                  case ADesc(_, AList(Seq(AStr(a), _*))) => a
                  case _ => ""
                }
                else fieldAt(fs, 6) match {
                  case ADesc(_, AList(Seq(AStr(a), _*))) => a
                  case _ => ""
                }
              links(handle) = (address, clientIsReceiver)
              // echo attach with roles flipped
              writeFrame(out, Frame(0, f.channel, Some(perf(CAttach,
                fs.head, AUInt(handle), ABool(!clientIsReceiver),
                ANull, ANull, fieldAt(fs, 5), fieldAt(fs, 6))),
                Array.empty))
              if (!clientIsReceiver)
                // grant the sender link credit
                writeFrame(out, Frame(0, f.channel, Some(perf(CFlow,
                  AUInt(0), AUInt(1024), AUInt(0), AUInt(1024),
                  AUInt(handle), AUInt(0), AUInt(4096))), Array.empty))
            case CTransfer =>
              val fs = fieldsOf(p)
              val handle = fs.head match { case AUInt(h) => h; case _ => 0L }
              val id = fs(1) match { case AUInt(v) => v; case _ => 0L }
              val settled = fieldAt(fs, 4) match {
                case ABool(b) => b; case _ => false
              }
              val (address, _) = links(handle)
              val msg = decodeMessage(f.payload)
              val q = queue(address)
              q.synchronized { q.enqueue(msg) }
              if (!settled)
                writeFrame(out, Frame(0, f.channel, Some(perf(
                  CDisposition, ABool(true), AUInt(id), AUInt(id),
                  ABool(true), ADesc(AULong(CAccepted), AList(Nil)))),
                  Array.empty))
            case CFlow =>
              val fs = fieldsOf(p)
              val handle = fieldAt(fs, 4) match {
                case AUInt(h) => Some(h); case _ => None
              }
              val credit = fieldAt(fs, 6) match {
                case AUInt(c) => c.toInt; case _ => 0
              }
              val drain = fieldAt(fs, 9) match {
                case ABool(b) => b; case _ => false
              }
              handle.foreach { h =>
                val (address, clientIsReceiver) = links(h)
                if (clientIsReceiver) {
                  val q = queue(address)
                  var sent = 0
                  while (sent < credit && q.synchronized(q.nonEmpty)) {
                    val msg = q.synchronized(q.dequeue())
                    val id = nextDeliveryId
                    nextDeliveryId += 1
                    unsettled(id) = (address, msg)
                    writeFrame(out, Frame(0, f.channel, Some(perf(
                      CTransfer, AUInt(h), AUInt(id),
                      ABin(ByteBuffer.allocate(8).putLong(id).array()),
                      AUInt(0), ABool(false))), encodeMessage(msg)))
                    sent += 1
                  }
                  if (drain && sent < credit)
                    // §2.6.7: drain exhausts remaining credit
                    writeFrame(out, Frame(0, f.channel, Some(perf(CFlow,
                      AUInt(0), AUInt(1024), AUInt(0), AUInt(1024),
                      AUInt(h), AUInt(sent.toLong), AUInt(0),
                      ANull, ANull, ABool(true))), Array.empty))
                }
              }
            case CDisposition =>
              val fs = fieldsOf(p)
              val lo = fs(1) match { case AUInt(v) => v; case _ => 0L }
              val hi = fieldAt(fs, 2) match {
                case AUInt(v) => v; case _ => lo
              }
              (lo to hi).foreach(unsettled.remove)
            case CDetach =>
              val fs = fieldsOf(p)
              val handle = fs.head match { case AUInt(h) => h; case _ => 0L }
              // at-least-once: unacked deliveries return to the queue
              unsettled.toSeq.sortBy(_._1).foreach { case (id, (a, m)) =>
                val q = queue(a)
                q.synchronized { q.enqueue(m) }
                unsettled.remove(id)
              }
              writeFrame(out, Frame(0, f.channel, Some(perf(CDetach,
                AUInt(handle), ABool(true))), Array.empty))
            case CEnd =>
              writeFrame(out, Frame(0, f.channel, Some(perf(CEnd)),
                Array.empty))
            case CClose =>
              writeFrame(out, Frame(0, 0, Some(perf(CClose)), Array.empty))
              open = false
            case other =>
              throw new IllegalStateException(s"amqp1: performative $other")
          }
        }
      } catch {
        case _: EOFException | _: java.net.SocketException => ()
        case e: Exception =>
          System.err.println(s"[amqp1-broker] ${e.getMessage}")
      } finally {
        try socket.close() catch { case _: Exception => () }
      }
    }
  }

  // ─────────────────────── spark input/output ───────────────────────

  /** `amqp_1` INPUT: drain up to `max` messages from one receiver
    * link; decoded messages parallelize.
    */
  def read(spark: SparkSession, host: String, port: Int, address: String,
           max: Int = 10000, user: String = null,
           pass: String = null): DataFrame = {
    val c = new Client(host, port, user, pass)
    val msgs = try c.receive(address, max) finally c.close()
    val rows = msgs.zipWithIndex.map { case (m, i) =>
      Row(new String(m.body, UTF_8),
        Map("amqp_message_id" -> m.messageId) ++ m.appProps, null, i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, math.min(math.max(rows.size, 1),
          spark.sparkContext.defaultParallelism))), BrokerStream.schema)
  }

  /** `amqp_1` OUTPUT: one connection per partition, transfers settled
    * by broker dispositions.
    */
  def write(df: DataFrame, host: String, port: Int, address: String,
            user: String = null, pass: String = null,
            batchSize: Int = 512): Unit = {
    val (h, p, a, u, pw, bs) = (host, port, address, user, pass, batchSize)
    df.select(org.apache.spark.sql.functions.col("value").cast("string"))
      .rdd.foreachPartition { it =>
        if (it.hasNext) {
          val c = new Client(h, p, u, pw)
          try it.grouped(bs).foreach { rows =>
            c.sendAll(a, rows.map(r =>
              Message(r.getString(0).getBytes(UTF_8),
                messageId = java.util.UUID.randomUUID.toString)))
          } finally c.close()
        }
      }
  }
}
