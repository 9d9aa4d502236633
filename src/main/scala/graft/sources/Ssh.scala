package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import scala.collection.mutable

/** SSH2 transport for the `sftp` connector family
  * (internal/impl/sftp — contract only, no code ported: the reference
  * uses an SSH client library; this implements the PUBLIC SSH2
  * protocol — RFC 4253 transport, RFC 5656/8731 curve25519-sha256 key
  * exchange, RFC 8709 ssh-ed25519 host keys, RFC 4252 password
  * authentication, RFC 4254 channels — over the JDK's X25519/Ed25519/
  * AES-CTR/HMAC-SHA2 primitives):
  *
  *   - version exchange, then the binary packet protocol
  *     (packet_length, padding, payload, random padding, MAC);
  *   - KEXINIT negotiation (curve25519-sha256, ssh-ed25519,
  *     aes128-ctr, hmac-sha2-256, no compression);
  *   - ECDH: shared secret K, exchange hash
  *     `H = SHA256(V_C‖V_S‖I_C‖I_S‖K_S‖Q_C‖Q_S‖K)`, host-key
  *     signature over H verified client-side;
  *   - key derivation per RFC 4253 §7.2
  *     (`HASH(K‖H‖"A"…"F"‖session_id)`, extended to length) —
  *     cross-checked in SshSpec against an independent derivation;
  *   - encrypt-and-MAC packets (AES-128-CTR, HMAC-SHA2-256 over
  *     `seq‖clear packet`), per-direction sequence numbers;
  *   - password userauth and session channels with windowed DATA.
  */
object Ssh {

  // message numbers
  val MsgDisconnect = 1
  val MsgIgnore = 2
  val MsgServiceRequest = 5
  val MsgServiceAccept = 6
  val MsgKexInit = 20
  val MsgNewKeys = 21
  val MsgKexEcdhInit = 30
  val MsgKexEcdhReply = 31
  val MsgUserauthRequest = 50
  val MsgUserauthFailure = 51
  val MsgUserauthSuccess = 52
  val MsgChannelOpen = 90
  val MsgChannelOpenConfirm = 91
  val MsgChannelOpenFailure = 92
  val MsgChannelWindowAdjust = 93
  val MsgChannelData = 94
  val MsgChannelEof = 96
  val MsgChannelClose = 97
  val MsgChannelRequest = 98
  val MsgChannelSuccess = 99
  val MsgChannelFailure = 100

  // ---- wire primitives ----

  final class Buf {
    private val out = new ByteArrayOutputStream()
    def u8(v: Int): Buf = { out.write(v); this }
    def u32(v: Long): Buf = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      this
    }
    def raw(b: Array[Byte]): Buf = { out.write(b); this }
    def str(b: Array[Byte]): Buf = { u32(b.length.toLong); raw(b) }
    def str(s: String): Buf = str(s.getBytes(UTF_8))
    def bool(b: Boolean): Buf = u8(if (b) 1 else 0)
    /** SSH mpint: two's-complement with a leading 0 when the MSB set. */
    def mpint(unsigned: Array[Byte]): Buf = {
      val trimmed = unsigned.dropWhile(_ == 0)
      if (trimmed.isEmpty) str(Array.empty[Byte])
      else if ((trimmed(0) & 0x80) != 0) str(0.toByte +: trimmed)
      else str(trimmed)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  final class Reader(val b: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val v = b(pos) & 0xFF; pos += 1; v }
    def u32(): Long = {
      val v = ((b(pos) & 0xFFL) << 24) | ((b(pos + 1) & 0xFFL) << 16) |
        ((b(pos + 2) & 0xFFL) << 8) | (b(pos + 3) & 0xFFL)
      pos += 4; v
    }
    def raw(n: Int): Array[Byte] = {
      val v = b.slice(pos, pos + n); pos += n; v
    }
    def str(): Array[Byte] = raw(u32().toInt)
    def strUtf8(): String = new String(str(), UTF_8)
    def bool(): Boolean = u8() != 0
    def remaining(): Array[Byte] = b.slice(pos, b.length)
  }

  // ---- negotiated algorithm names (the only supported set) ----
  val KexAlg = "curve25519-sha256"
  val HostKeyAlg = "ssh-ed25519"
  val CipherAlg = "aes128-ctr"
  val MacAlg = "hmac-sha2-256"

  def kexInitPayload(cookie: Array[Byte]): Array[Byte] =
    new Buf().u8(MsgKexInit).raw(cookie)
      .str(KexAlg).str(HostKeyAlg)
      .str(CipherAlg).str(CipherAlg)   // ciphers c2s, s2c
      .str(MacAlg).str(MacAlg)         // macs
      .str("none").str("none")         // compression
      .str("").str("")                 // languages
      .bool(false).u32(0).bytes

  /** RFC 4253 §7.2 key derivation: `K1 = HASH(K‖H‖X‖session_id)`,
    * `Kn+1 = HASH(K‖H‖K1‖…‖Kn)`, truncated to `len`.
    */
  def deriveKey(k: Array[Byte], h: Array[Byte], x: Char,
                sessionId: Array[Byte], len: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    val kM = new Buf().mpint(k).bytes
    var out = md.digest(kM ++ h ++ Array(x.toByte) ++ sessionId)
    while (out.length < len)
      out = out ++ MessageDigest.getInstance("SHA-256")
        .digest(kM ++ h ++ out)
    out.take(len)
  }

  /** Exchange hash H (curve25519-sha256). */
  def exchangeHash(vC: String, vS: String, iC: Array[Byte],
                   iS: Array[Byte], kS: Array[Byte], qC: Array[Byte],
                   qS: Array[Byte], k: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(new Buf()
      .str(vC).str(vS).str(iC).str(iS).str(kS).str(qC).str(qS)
      .mpint(k).bytes)

  // ---- X25519 / Ed25519 over JDK primitives ----

  object Curve {
    import java.security._
    import java.security.spec._
    import java.security.interfaces.{EdECPublicKey, XECPublicKey}

    def x25519KeyPair(): KeyPair =
      KeyPairGenerator.getInstance("X25519").generateKeyPair()

    /** Raw little-endian 32-byte public key. */
    def x25519PublicRaw(kp: KeyPair): Array[Byte] = {
      val u = kp.getPublic.asInstanceOf[XECPublicKey].getU
      val le = u.toByteArray.reverse // BigInteger BE → LE
      le.padTo(32, 0.toByte).take(32)
    }

    def x25519Shared(priv: PrivateKey, peerRaw: Array[Byte]): Array[Byte] = {
      val u = BigInt(1, peerRaw.reverse.toArray).bigInteger
      val spec = new XECPublicKeySpec(NamedParameterSpec.X25519, u)
      val pub = KeyFactory.getInstance("X25519").generatePublic(spec)
      val ka = javax.crypto.KeyAgreement.getInstance("X25519")
      ka.init(priv)
      ka.doPhase(pub, true)
      ka.generateSecret()
    }

    def ed25519KeyPair(): KeyPair =
      KeyPairGenerator.getInstance("Ed25519").generateKeyPair()

    /** Raw 32-byte public key per RFC 8032 (y LE with x-parity bit). */
    def ed25519PublicRaw(pub: PublicKey): Array[Byte] = {
      val p = pub.asInstanceOf[EdECPublicKey].getPoint
      val y = p.getY.toByteArray.reverse.padTo(32, 0.toByte).take(32)
      if (p.isXOdd) y.updated(31, (y(31) | 0x80).toByte) else y
    }

    def ed25519Sign(priv: PrivateKey, data: Array[Byte]): Array[Byte] = {
      val s = Signature.getInstance("Ed25519")
      s.initSign(priv); s.update(data); s.sign()
    }

    def ed25519Verify(rawPub: Array[Byte], data: Array[Byte],
                      sig: Array[Byte]): Boolean = {
      val xOdd = (rawPub(31) & 0x80) != 0
      val yBytes = rawPub.updated(31, (rawPub(31) & 0x7F).toByte)
      val y = BigInt(1, yBytes.reverse.toArray).bigInteger
      val point = new java.security.spec.EdECPoint(xOdd, y)
      val spec = new java.security.spec.EdECPublicKeySpec(
        java.security.spec.NamedParameterSpec.ED25519, point)
      val pub = java.security.KeyFactory.getInstance("Ed25519")
        .generatePublic(spec)
      val s = Signature.getInstance("Ed25519")
      s.initVerify(pub); s.update(data); s.verify(sig)
    }
  }

  /** Host key blob `string "ssh-ed25519", string raw-key` and the
    * signature blob `string "ssh-ed25519", string raw-sig`.
    */
  def hostKeyBlob(rawPub: Array[Byte]): Array[Byte] =
    new Buf().str(HostKeyAlg).str(rawPub).bytes
  def signatureBlob(rawSig: Array[Byte]): Array[Byte] =
    new Buf().str(HostKeyAlg).str(rawSig).bytes

  // ---- the encrypted binary packet protocol ----

  final class PacketIo(in: DataInputStream, out: DataOutputStream) {
    private val rnd = new java.security.SecureRandom()
    private var sendSeq = 0L
    private var recvSeq = 0L
    private var sendCipher: javax.crypto.Cipher = _
    private var recvCipher: javax.crypto.Cipher = _
    private var sendMac: javax.crypto.Mac = _
    private var recvMac: javax.crypto.Mac = _

    def enableCrypto(sendKey: Array[Byte], sendIv: Array[Byte],
                     sendMacKey: Array[Byte], recvKey: Array[Byte],
                     recvIv: Array[Byte], recvMacKey: Array[Byte]): Unit = {
      def cipher(mode: Int, key: Array[Byte], iv: Array[Byte]) = {
        val c = javax.crypto.Cipher.getInstance("AES/CTR/NoPadding")
        c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        c
      }
      def mac(key: Array[Byte]) = {
        val m = javax.crypto.Mac.getInstance("HmacSHA256")
        m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
        m
      }
      sendCipher = cipher(javax.crypto.Cipher.ENCRYPT_MODE, sendKey, sendIv)
      recvCipher = cipher(javax.crypto.Cipher.DECRYPT_MODE, recvKey, recvIv)
      sendMac = mac(sendMacKey)
      recvMac = mac(recvMacKey)
    }

    def send(payload: Array[Byte]): Unit = synchronized {
      val block = 16 // AES block (8 pre-kex also fine with 16)
      var padLen = block - ((5 + payload.length) % block)
      if (padLen < 4) padLen += block
      val padding = new Array[Byte](padLen)
      rnd.nextBytes(padding)
      val clear = new Buf().u32((1 + payload.length + padLen).toLong)
        .u8(padLen).raw(payload).raw(padding).bytes
      if (sendCipher == null) out.write(clear)
      else {
        sendMac.reset()
        sendMac.update(new Buf().u32(sendSeq).bytes)
        val tag = sendMac.doFinal(clear)
        out.write(sendCipher.update(clear))
        out.write(tag)
      }
      out.flush()
      sendSeq += 1
    }

    def receive(): Array[Byte] = synchronized {
      if (recvCipher == null) {
        val head = new Array[Byte](4)
        in.readFully(head)
        val len = new Reader(head).u32().toInt
        val rest = new Array[Byte](len)
        in.readFully(rest)
        recvSeq += 1
        val padLen = rest(0) & 0xFF
        rest.slice(1, len - padLen)
      } else {
        val headEnc = new Array[Byte](16)
        in.readFully(headEnc)
        val head = recvCipher.update(headEnc)
        val len = new Reader(head).u32().toInt
        val restEnc = new Array[Byte](len - 12)
        in.readFully(restEnc)
        // Cipher.update(empty) returns null — a 16-byte packet has no
        // remainder beyond the first decrypted block
        val rest =
          if (restEnc.isEmpty) Array.empty[Byte]
          else recvCipher.update(restEnc)
        val tag = new Array[Byte](32)
        in.readFully(tag)
        val clear = head ++ rest
        recvMac.reset()
        recvMac.update(new Buf().u32(recvSeq).bytes)
        val expect = recvMac.doFinal(clear)
        require(java.util.Arrays.equals(expect, tag),
          "ssh: MAC verification failed")
        recvSeq += 1
        val padLen = clear(4) & 0xFF
        clear.slice(5, 4 + len - padLen)
      }
    }
  }

  /** Shared post-handshake connection state: one session channel. */
  final class Transport(val io: PacketIo, val sessionId: Array[Byte])

  // ---- client handshake ----

  final class Client(socket: java.net.Socket, user: String,
                     password: String) {
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))
    val io = new PacketIo(in, out)
    private var sessionId: Array[Byte] = _
    var serverHostKeyRaw: Array[Byte] = _

    def connect(): Unit = {
      val vC = "SSH-2.0-graft_0.1"
      out.write((vC + "\r\n").getBytes(UTF_8)); out.flush()
      val vS = readVersionLine()
      // KEXINIT exchange
      val cookie = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(cookie)
      val iC = kexInitPayload(cookie)
      io.send(iC)
      val iS = expect(MsgKexInit)
      // ECDH
      val kp = Curve.x25519KeyPair()
      val qC = Curve.x25519PublicRaw(kp)
      io.send(new Buf().u8(MsgKexEcdhInit).str(qC).bytes)
      val reply = new Reader(expect(MsgKexEcdhReply))
      reply.u8()
      val kS = reply.str()
      val qS = reply.str()
      val sigBlob = reply.str()
      val k = Curve.x25519Shared(kp.getPrivate, qS)
      val h = exchangeHash(vC, vS, iC, iS, kS, qC, qS, k)
      // verify the host signature over H
      val kSr = new Reader(kS)
      require(kSr.strUtf8() == HostKeyAlg, "ssh: unexpected host key type")
      serverHostKeyRaw = kSr.str()
      val sigR = new Reader(sigBlob)
      require(sigR.strUtf8() == HostKeyAlg, "ssh: unexpected signature type")
      require(Curve.ed25519Verify(serverHostKeyRaw, h, sigR.str()),
        "ssh: host key signature verification failed")
      sessionId = h
      io.send(Array(MsgNewKeys.toByte))
      expect(MsgNewKeys)
      // directions: client send = c2s (A/C/E), recv = s2c (B/D/F)
      io.enableCrypto(
        deriveKey(k, h, 'C', sessionId, 16), deriveKey(k, h, 'A', sessionId, 16),
        deriveKey(k, h, 'E', sessionId, 32),
        deriveKey(k, h, 'D', sessionId, 16), deriveKey(k, h, 'B', sessionId, 16),
        deriveKey(k, h, 'F', sessionId, 32))
      // userauth
      io.send(new Buf().u8(MsgServiceRequest).str("ssh-userauth").bytes)
      expect(MsgServiceAccept)
      io.send(new Buf().u8(MsgUserauthRequest).str(user)
        .str("ssh-connection").str("password").bool(false)
        .str(password).bytes)
      val authResp = io.receive()
      if ((authResp(0) & 0xFF) != MsgUserauthSuccess)
        throw new IllegalStateException("ssh: authentication failed")
    }

    /** Open the session channel and start the named subsystem. */
    def openSubsystem(name: String): Int = {
      io.send(new Buf().u8(MsgChannelOpen).str("session")
        .u32(0).u32(1L << 20).u32(32768).bytes)
      val conf = new Reader(expect(MsgChannelOpenConfirm))
      conf.u8(); conf.u32() // recipient (us)
      val serverChannel = conf.u32().toInt
      io.send(new Buf().u8(MsgChannelRequest).u32(serverChannel.toLong)
        .str("subsystem").bool(true).str(name).bytes)
      val r = io.receive()
      require((r(0) & 0xFF) == MsgChannelSuccess,
        s"ssh: subsystem $name refused")
      serverChannel
    }

    def sendChannelData(channel: Int, data: Array[Byte]): Unit =
      io.send(new Buf().u8(MsgChannelData).u32(channel.toLong)
        .str(data).bytes)

    /** Next DATA payload on the channel (skipping window adjusts). */
    def receiveChannelData(): Array[Byte] = {
      var r = io.receive()
      while ((r(0) & 0xFF) == MsgChannelWindowAdjust ||
             (r(0) & 0xFF) == MsgIgnore) r = io.receive()
      require((r(0) & 0xFF) == MsgChannelData,
        f"ssh: expected CHANNEL_DATA, got ${r(0) & 0xFF}%d")
      val rd = new Reader(r)
      rd.u8(); rd.u32()
      rd.str()
    }

    def close(): Unit = socket.close()

    private def readVersionLine(): String = {
      val sb = new StringBuilder
      var done = false
      while (!done) {
        val c = in.read()
        require(c >= 0, "ssh: closed during version exchange")
        if (c == '\n') {
          val line = sb.toString.stripSuffix("\r")
          if (line.startsWith("SSH-")) return line
          sb.clear() // pre-version banner lines are allowed
        } else sb.append(c.toChar)
      }
      throw new IllegalStateException("unreachable")
    }

    private def expect(msg: Int): Array[Byte] = {
      var p = io.receive()
      while ((p(0) & 0xFF) == MsgIgnore) p = io.receive()
      require((p(0) & 0xFF) == msg,
        f"ssh: expected message $msg%d, got ${p(0) & 0xFF}%d")
      p
    }
  }

  // ---- server handshake (loopback) ----

  final class ServerConn(socket: java.net.Socket, user: String,
                         password: String,
                         hostKey: java.security.KeyPair) {
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))
    val io = new PacketIo(in, out)
    var clientChannel = 0

    /** Run the handshake through subsystem start; returns the
      * requested subsystem name.
      */
    def accept(): String = {
      val vS = "SSH-2.0-graft_server_0.1"
      val vC = {
        val sb = new StringBuilder
        var line = ""
        while (!line.startsWith("SSH-")) {
          sb.clear()
          var c = in.read()
          while (c != '\n') {
            require(c >= 0, "ssh: closed in version exchange")
            sb.append(c.toChar); c = in.read()
          }
          line = sb.toString.stripSuffix("\r")
        }
        line
      }
      out.write((vS + "\r\n").getBytes(UTF_8)); out.flush()
      val iC = io.receive()
      require((iC(0) & 0xFF) == MsgKexInit, "ssh: expected client KEXINIT")
      val cookie = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(cookie)
      val iS = kexInitPayload(cookie)
      io.send(iS)
      val init = new Reader(io.receive())
      require(init.u8() == MsgKexEcdhInit, "ssh: expected ECDH_INIT")
      val qC = init.str()
      val kp = Curve.x25519KeyPair()
      val qS = Curve.x25519PublicRaw(kp)
      val k = Curve.x25519Shared(kp.getPrivate, qC)
      val kS = hostKeyBlob(Curve.ed25519PublicRaw(hostKey.getPublic))
      val h = exchangeHash(vC, vS, iC, iS, kS, qC, qS, k)
      val sig = signatureBlob(Curve.ed25519Sign(hostKey.getPrivate, h))
      io.send(new Buf().u8(MsgKexEcdhReply).str(kS).str(qS).str(sig).bytes)
      io.send(Array(MsgNewKeys.toByte))
      require((io.receive()(0) & 0xFF) == MsgNewKeys, "ssh: expected NEWKEYS")
      // server send = s2c (B/D/F), recv = c2s (A/C/E)
      io.enableCrypto(
        deriveKey(k, h, 'D', h, 16), deriveKey(k, h, 'B', h, 16),
        deriveKey(k, h, 'F', h, 32),
        deriveKey(k, h, 'C', h, 16), deriveKey(k, h, 'A', h, 16),
        deriveKey(k, h, 'E', h, 32))
      val svc = new Reader(io.receive())
      require(svc.u8() == MsgServiceRequest, "ssh: expected SERVICE_REQUEST")
      io.send(new Buf().u8(MsgServiceAccept).str("ssh-userauth").bytes)
      val auth = new Reader(io.receive())
      require(auth.u8() == MsgUserauthRequest)
      val gotUser = auth.strUtf8()
      auth.strUtf8() // service
      val method = auth.strUtf8()
      val ok = method == "password" && {
        auth.bool()
        gotUser == user && auth.strUtf8() == password
      }
      if (!ok) {
        io.send(new Buf().u8(MsgUserauthFailure).str("password")
          .bool(false).bytes)
        throw new IllegalStateException("ssh: auth rejected")
      }
      io.send(Array(MsgUserauthSuccess.toByte))
      val open = new Reader(io.receive())
      require(open.u8() == MsgChannelOpen)
      require(open.strUtf8() == "session")
      clientChannel = open.u32().toInt
      io.send(new Buf().u8(MsgChannelOpenConfirm)
        .u32(clientChannel.toLong).u32(0).u32(1L << 20).u32(32768).bytes)
      val req = new Reader(io.receive())
      require(req.u8() == MsgChannelRequest)
      req.u32()
      require(req.strUtf8() == "subsystem")
      val wantReply = req.bool()
      val name = req.strUtf8()
      if (wantReply)
        io.send(new Buf().u8(MsgChannelSuccess).u32(clientChannel.toLong)
          .bytes)
      name
    }

    def receiveChannelData(): Array[Byte] = {
      var r = io.receive()
      while ((r(0) & 0xFF) == MsgChannelWindowAdjust ||
             (r(0) & 0xFF) == MsgIgnore) r = io.receive()
      if ((r(0) & 0xFF) == MsgChannelEof || (r(0) & 0xFF) == MsgChannelClose)
        return null
      require((r(0) & 0xFF) == MsgChannelData)
      val rd = new Reader(r)
      rd.u8(); rd.u32()
      rd.str()
    }

    def sendChannelData(data: Array[Byte]): Unit =
      io.send(new Buf().u8(MsgChannelData).u32(clientChannel.toLong)
        .str(data).bytes)

    def close(): Unit = socket.close()
  }
}
