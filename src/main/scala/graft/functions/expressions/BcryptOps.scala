package graft.functions.expressions

/** bcrypt (public algorithm: Provos & Mazières, "A Future-Adaptable
  * Password Scheme" — EksBlowfish key setup + 64× ECB encryption of
  * "OrpheanBeholderScryDoubt"), backing the reference's
  * `compare_bcrypt` Bloblang method (methods.adoc credentials
  * section). No bcrypt jar ships with Spark; the implementation is
  * self-contained — even the Blowfish P/S-box init constants are
  * DERIVED (they are the hexadecimal digits of π, computed once per
  * JVM via a Machin-formula BigDecimal expansion and verified against
  * the published first words) instead of embedding 1042 literals.
  */
object BcryptOps {

  private val BlowfishRounds = 16
  private val PLen = BlowfishRounds + 2 // 18
  private val SLen = 4 * 256 // 1024

  /** 1042 init words = first 8336 hex digits of π's fraction, computed
    * in fixed-point BigInteger arithmetic (Machin's formula; every
    * division is by a small value, so the whole derivation is
    * sub-second once per JVM).
    */
  private lazy val piWords: Array[Int] = {
    import java.math.BigInteger
    val hexDigits = (PLen + SLen) * 8 // 8336
    val guard = 16
    val shift = 4 * (hexDigits + guard)
    val one = BigInteger.ONE.shiftLeft(shift)
    def atanInv(x: Long): BigInteger = {
      // atan(1/x) = Σ (-1)^k / ((2k+1) x^(2k+1)), fixed-point ×2^shift
      val x2 = BigInteger.valueOf(x * x)
      var term = one.divide(BigInteger.valueOf(x))
      var sum = term
      var k = 1
      while (term.signum != 0) {
        term = term.divide(x2)
        val contrib = term.divide(BigInteger.valueOf(2L * k + 1))
        sum = if (k % 2 == 1) sum.subtract(contrib) else sum.add(contrib)
        k += 1
      }
      sum
    }
    // Machin: π = 16 atan(1/5) − 4 atan(1/239)
    val pi = atanInv(5).shiftLeft(4).subtract(atanInv(239).shiftLeft(2))
    val frac = pi.subtract(BigInteger.valueOf(3).shiftLeft(shift))
    // fraction ×16^(hexDigits): its hex form IS the digit stream
    val hex = frac.shiftRight(4 * guard).toString(16)
    val padded = ("0" * (hexDigits - hex.length)) + hex
    val out = Array.tabulate(PLen + SLen)(w =>
      java.lang.Long.parseLong(padded.substring(8 * w, 8 * w + 8), 16).toInt)
    require(out(0) == 0x243f6a88 && out(1) == 0x85a308d3,
      "π hex-digit derivation failed self-check")
    out
  }

  private final class State {
    val P: Array[Int] = java.util.Arrays.copyOfRange(piWords, 0, PLen)
    val S: Array[Int] = java.util.Arrays.copyOfRange(piWords, PLen, PLen + SLen)

    def encipher(lr: Array[Int], off: Int): Unit = {
      var l = lr(off) ^ P(0)
      var r = lr(off + 1)
      var i = 0
      while (i < BlowfishRounds) {
        val n = S((l >>> 24) & 0xff) +
          S(0x100 | ((l >>> 16) & 0xff))
        val f = (n ^ S(0x200 | ((l >>> 8) & 0xff))) + S(0x300 | (l & 0xff))
        r ^= f ^ P(i + 1)
        val t = l; l = r; r = t
        i += 1
      }
      lr(off) = r ^ P(BlowfishRounds + 1)
      lr(off + 1) = l
    }

    private def streamToWord(data: Array[Byte], offp: Array[Int]): Int = {
      var word = 0
      var off = offp(0)
      var i = 0
      while (i < 4) {
        word = (word << 8) | (data(off) & 0xff)
        off = (off + 1) % data.length
        i += 1
      }
      offp(0) = off
      word
    }

    def expandKey(key: Array[Byte]): Unit = {
      val offp = Array(0)
      var i = 0
      while (i < PLen) { P(i) ^= streamToWord(key, offp); i += 1 }
      val lr = Array(0, 0)
      i = 0
      while (i < PLen) {
        encipher(lr, 0); P(i) = lr(0); P(i + 1) = lr(1); i += 2
      }
      i = 0
      while (i < SLen) {
        encipher(lr, 0); S(i) = lr(0); S(i + 1) = lr(1); i += 2
      }
    }

    /** ExpandKey with salt folded into the chaining (the Eks part). */
    def expandKeySalted(salt: Array[Byte], key: Array[Byte]): Unit = {
      val offp = Array(0)
      var i = 0
      while (i < PLen) { P(i) ^= streamToWord(key, offp); i += 1 }
      val soff = Array(0)
      val lr = Array(0, 0)
      i = 0
      while (i < PLen) {
        lr(0) ^= streamToWord(salt, soff)
        lr(1) ^= streamToWord(salt, soff)
        encipher(lr, 0); P(i) = lr(0); P(i + 1) = lr(1); i += 2
      }
      i = 0
      while (i < SLen) {
        lr(0) ^= streamToWord(salt, soff)
        lr(1) ^= streamToWord(salt, soff)
        encipher(lr, 0); S(i) = lr(0); S(i + 1) = lr(1); i += 2
      }
    }
  }

  // "OrpheanBeholderScryDoubt" as 6 big-endian words
  private val CipherText: Array[Int] = {
    val b = "OrpheanBeholderScryDoubt".getBytes("US-ASCII")
    Array.tabulate(6)(i => ((b(4 * i) & 0xff) << 24) |
      ((b(4 * i + 1) & 0xff) << 16) | ((b(4 * i + 2) & 0xff) << 8) |
      (b(4 * i + 3) & 0xff))
  }

  private def cryptRaw(password: Array[Byte], salt: Array[Byte],
                       cost: Int): Array[Byte] = {
    require(cost >= 4 && cost <= 31, s"bcrypt cost $cost")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    val st = new State
    st.expandKeySalted(salt, password)
    var r = 0L
    val rounds = 1L << cost
    while (r < rounds) {
      st.expandKey(password)
      st.expandKey(salt)
      r += 1
    }
    val block = CipherText.clone()
    (0 until 64).foreach { _ =>
      var i = 0
      while (i < 6) { st.encipher(block, i); i += 2 }
    }
    val out = new Array[Byte](23)
    var i = 0
    while (i < 23) {
      out(i) = ((block(i / 4) >>> (24 - 8 * (i % 4))) & 0xff).toByte
      i += 1
    }
    out
  }

  private val B64 =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  private def b64Decode(s: String, maxLen: Int): Array[Byte] = {
    val bits = s.map(c => {
      val v = B64.indexOf(c.toInt)
      require(v >= 0, s"bad bcrypt base64 char '$c'")
      v
    })
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    bits.foreach { v =>
      acc = (acc << 6) | v
      nbits += 6
      if (nbits >= 8) {
        nbits -= 8
        out.write((acc >>> nbits) & 0xff)
      }
    }
    java.util.Arrays.copyOf(out.toByteArray, maxLen)
  }

  private def b64Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var acc = 0
    var nbits = 0
    data.foreach { b =>
      acc = (acc << 8) | (b & 0xff)
      nbits += 8
      while (nbits >= 6) {
        nbits -= 6
        sb.append(B64((acc >>> nbits) & 0x3f))
      }
    }
    if (nbits > 0) sb.append(B64((acc << (6 - nbits)) & 0x3f))
    sb.toString
  }

  /** Hash `password` against a full `$2a$cost$salt...` spec string
    * (salt portion = first 22 b64 chars after the cost).
    */
  def hash(password: String, spec: String): String = {
    val m = java.util.regex.Pattern
      .compile("^\\$(2[abxy]?)\\$(\\d\\d)\\$(.{22})").matcher(spec)
    require(m.find(), s"not a bcrypt hash: ${spec.take(7)}…")
    val minor = m.group(1)
    val cost = m.group(2).toInt
    val salt = b64Decode(m.group(3), 16)
    // 2a and later null-terminate the key; the original '$2$' scheme
    // does not
    val pwRaw = password.getBytes("UTF-8")
    val pw = if (minor == "2") pwRaw else pwRaw :+ 0.toByte
    val raw = cryptRaw(if (pw.length > 72) java.util.Arrays.copyOf(pw, 72) else pw,
      salt, cost)
    f"$$$minor%s$$$cost%02d$$${m.group(3)}%s${b64Encode(raw)}%s"
  }

  /** Constant-time comparison of `password` against `hashed`. */
  def compare(password: String, hashed: String): Boolean = {
    val computed = hash(password, hashed)
    java.security.MessageDigest.isEqual(
      computed.getBytes("UTF-8"), hashed.getBytes("UTF-8"))
  }

  /** UTF8String surface for codegen. */
  def compareU(password: org.apache.spark.unsafe.types.UTF8String,
               hashed: org.apache.spark.unsafe.types.UTF8String): Boolean =
    compare(password.toString, hashed.toString)
}
