package graft.functions.expressions

/** Argon2 (public RFC 9106) + Blake2b (public RFC 7693), backing the
  * reference's `compare_argon2` Bloblang method (methods.adoc
  * credentials section; reference impl internal/impl/crypto/argon2.go).
  * No argon2/blake2b jar ships with Spark — both primitives are
  * implemented here directly from their RFCs and validated against the
  * reference's own published test vectors (argon2_test.go:27-28).
  *
  * Supports argon2i and argon2id (the variants the reference accepts),
  * any parallelism/memory/iterations, version 0x13.
  */
object Argon2Ops {

  // ── Blake2b (RFC 7693) ────────────────────────────────────────────

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + 8 * i + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = Sigma(r % 10)
      @inline def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
        v(a) = v(a) + v(b) + x
        v(d) = rotr(v(d) ^ v(a), 32)
        v(c) = v(c) + v(d)
        v(b) = rotr(v(b) ^ v(c), 24)
        v(a) = v(a) + v(b) + y
        v(d) = rotr(v(d) ^ v(a), 16)
        v(c) = v(c) + v(d)
        v(b) = rotr(v(b) ^ v(c), 63)
      }
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Blake2b with no key, digest length `outLen` (1..64). */
  def blake2b(data: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64)
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong
    var off = 0
    var t = 0L
    // full blocks except the last (the final block is always compressed
    // with the last flag, padded with zeros)
    while (data.length - off > 128) {
      t += 128
      compress(h, data, off, t, last = false)
      off += 128
    }
    val fin = new Array[Byte](128)
    System.arraycopy(data, off, fin, 0, data.length - off)
    t += (data.length - off)
    compress(h, fin, 0, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  // ── Argon2 (RFC 9106) ─────────────────────────────────────────────

  private def le32(v: Int): Array[Byte] =
    Array(v, v >>> 8, v >>> 16, v >>> 24).map(_.toByte)

  /** H' — variable-length hash (RFC 9106 §3.3). */
  private def hPrime(x: Array[Byte], outLen: Int): Array[Byte] = {
    val pre = le32(outLen) ++ x
    if (outLen <= 64) blake2b(pre, outLen)
    else {
      val out = new Array[Byte](outLen)
      var v = blake2b(pre, 64)
      System.arraycopy(v, 0, out, 0, 32)
      var written = 32
      while (outLen - written > 64) {
        v = blake2b(v, 64)
        System.arraycopy(v, 0, out, written, 32)
        written += 32
      }
      v = blake2b(v, outLen - written)
      System.arraycopy(v, 0, out, written, outLen - written)
      out
    }
  }

  /** BlaMka permutation round on 16 lane words (indices into `z`). */
  private def pRound(z: Array[Long], idx: Array[Int]): Unit = {
    @inline def gb(ai: Int, bi: Int, ci: Int, di: Int): Unit = {
      var a = z(idx(ai)); var b = z(idx(bi)); var c = z(idx(ci)); var d = z(idx(di))
      a = a + b + 2L * (a & 0xffffffffL) * (b & 0xffffffffL)
      d = rotr(d ^ a, 32)
      c = c + d + 2L * (c & 0xffffffffL) * (d & 0xffffffffL)
      b = rotr(b ^ c, 24)
      a = a + b + 2L * (a & 0xffffffffL) * (b & 0xffffffffL)
      d = rotr(d ^ a, 16)
      c = c + d + 2L * (c & 0xffffffffL) * (d & 0xffffffffL)
      b = rotr(b ^ c, 63)
      z(idx(ai)) = a; z(idx(bi)) = b; z(idx(ci)) = c; z(idx(di)) = d
    }
    gb(0, 4, 8, 12); gb(1, 5, 9, 13); gb(2, 6, 10, 14); gb(3, 7, 11, 15)
    gb(0, 5, 10, 15); gb(1, 6, 11, 12); gb(2, 7, 8, 13); gb(3, 4, 9, 14)
  }

  // P-round index sets are compile-time constants — precomputed so the
  // memory-hard inner loop (millions of gMix calls per hash) allocates
  // nothing but its two working blocks
  private val RowIdx: Array[Array[Int]] =
    Array.tabulate(8)(i => Array.tabulate(16)(j => 16 * i + j))
  private val ColIdx: Array[Array[Int]] =
    Array.tabulate(8)(i => Array.tabulate(16)(j => 2 * i + 16 * (j / 2) + (j % 2)))

  /** G compression (RFC 9106 §3.5): Z = P-mixed (X^Y); out = X^Y^Z;
    * `xorInto` XORs the result into `out` (v1.3 later passes).
    */
  private def gMix(x: Array[Long], y: Array[Long], out: Array[Long],
                   xorInto: Boolean): Unit = {
    val r = new Array[Long](128)
    var i = 0
    while (i < 128) { r(i) = x(i) ^ y(i); i += 1 }
    val z = r.clone()
    // rows: 8 rows of 16 consecutive words
    i = 0
    while (i < 8) { pRound(z, RowIdx(i)); i += 1 }
    // columns: 8 groups of word-pairs down the rows
    i = 0
    while (i < 8) { pRound(z, ColIdx(i)); i += 1 }
    i = 0
    while (i < 128) {
      val v = r(i) ^ z(i)
      if (xorInto) out(i) ^= v else out(i) = v
      i += 1
    }
  }

  private def blockFromBytes(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](128)
    var i = 0
    while (i < 128) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (b(8 * i + j) & 0xffL); j -= 1 }
      out(i) = w
      i += 1
    }
    out
  }

  private def blockToBytes(z: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](1024)
    var i = 0
    while (i < 1024) {
      out(i) = ((z(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Raw Argon2 tag. `variant`: 1 = argon2i, 2 = argon2id. */
  def argon2(password: Array[Byte], salt: Array[Byte], timeCost: Int,
             memoryKib: Int, par: Int, tagLen: Int, variant: Int,
             version: Int = 0x13): Array[Byte] = {
    require(par >= 1 && timeCost >= 1 && memoryKib >= 8 * par,
      "argon2 parameter bounds")
    val h0 = blake2b(
      le32(par) ++ le32(tagLen) ++ le32(memoryKib) ++ le32(timeCost) ++
        le32(version) ++ le32(variant) ++
        le32(password.length) ++ password ++
        le32(salt.length) ++ salt ++ le32(0) ++ le32(0), 64)
    val mPrime = 4 * par * (memoryKib / (4 * par))
    val q = mPrime / par // lane length
    val segLen = q / 4
    // B(lane)(col)
    val B = Array.ofDim[Array[Long]](par, q)
    var lane = 0
    while (lane < par) {
      B(lane)(0) = blockFromBytes(hPrime(h0 ++ le32(0) ++ le32(lane), 1024))
      B(lane)(1) = blockFromBytes(hPrime(h0 ++ le32(1) ++ le32(lane), 1024))
      lane += 1
    }

    val zeroBlock = new Array[Long](128)
    var pass = 0
    while (pass < timeCost) {
      var slice = 0
      while (slice < 4) {
        lane = 0
        while (lane < par) {
          // data-independent J-pair stream (argon2i always; argon2id on
          // pass 0 slices 0-1)
          val dataIndependent =
            variant == 1 || (variant == 2 && pass == 0 && slice < 2)
          var addrBlock: Array[Long] = null
          var addrCounter = 0L
          def nextAddrBlock(): Array[Long] = {
            addrCounter += 1
            val in = new Array[Long](128)
            in(0) = pass.toLong; in(1) = lane.toLong; in(2) = slice.toLong
            in(3) = mPrime.toLong; in(4) = timeCost.toLong
            in(5) = variant.toLong; in(6) = addrCounter
            val tmp = new Array[Long](128)
            gMix(zeroBlock, in, tmp, xorInto = false)
            val outB = new Array[Long](128)
            gMix(zeroBlock, tmp, outB, xorInto = false)
            outB
          }
          var col = if (pass == 0 && slice == 0) 2 else 0
          while (col < segLen) {
            val j = slice * segLen + col
            val prev = B(lane)((j + q - 1) % q)
            val (j1, j2) =
              if (dataIndependent) {
                if (col % 128 == 0 || addrBlock == null) addrBlock = nextAddrBlock()
                val w = addrBlock(col % 128)
                ((w & 0xffffffffL), ((w >>> 32) & 0xffffffffL))
              } else (prev(0) & 0xffffffffL, (prev(0) >>> 32) & 0xffffffffL)
            val refLane =
              if (pass == 0 && slice == 0) lane
              else (j2 % par).toInt
            // reference window size (RFC 9106 §3.4.1.3)
            val sameLane = refLane == lane
            val areaSize: Long =
              if (pass == 0) {
                if (sameLane) (slice * segLen + col - 1).toLong
                else (slice * segLen - (if (col == 0) 1 else 0)).toLong
              } else {
                if (sameLane) (3 * segLen + col - 1).toLong
                else (3 * segLen - (if (col == 0) 1 else 0)).toLong
              }
            val x = (j1 * j1) >>> 32
            val y = (areaSize * x) >>> 32
            val zz = areaSize - 1 - y
            val startPos: Long =
              if (pass == 0) 0L
              else ((slice + 1) % 4).toLong * segLen
            val refIdx = ((startPos + zz) % q).toInt
            val xorInto = version == 0x13 && pass > 0
            if (B(lane)(j) == null) B(lane)(j) = new Array[Long](128)
            gMix(prev, B(refLane)(refIdx), B(lane)(j), xorInto)
            col += 1
          }
          lane += 1
        }
        slice += 1
      }
      pass += 1
    }
    // final: XOR of each lane's last column
    val c = B(0)(q - 1).clone()
    lane = 1
    while (lane < par) {
      var i = 0
      while (i < 128) { c(i) ^= B(lane)(q - 1)(i); i += 1 }
      lane += 1
    }
    hPrime(blockToBytes(c), tagLen)
  }

  /** compare_argon2: password vs a `$argon2(i|id)$v=19$m=..,t=..,p=..$
    * <b64 salt>$<b64 tag>` spec. Malformed specs throw (error-channel
    * recoverable), mirroring the reference's strict parser
    * (argon2.go parse tests).
    */
  def compare(password: String, spec: String): Boolean = {
    val m = java.util.regex.Pattern.compile(
      "^\\$(argon2i|argon2id)\\$v=(\\d+)\\$m=(\\d+),t=(\\d+),p=(\\d+)\\$([A-Za-z0-9+/]+)\\$([A-Za-z0-9+/]+)$")
      .matcher(spec)
    require(m.matches(), "not an argon2 hash spec")
    val variant = if (m.group(1) == "argon2i") 1 else 2
    val version = m.group(2).toInt
    require(version == 0x13, s"argon2 version $version unsupported")
    val mem = m.group(3).toInt
    val t = m.group(4).toInt
    val p = m.group(5).toInt
    require(p > 0 && p < 256 && t > 0 && mem >= 8 * p,
      "argon2 parameter bounds")
    val salt = java.util.Base64.getDecoder.decode(m.group(6))
    val tag = java.util.Base64.getDecoder.decode(m.group(7))
    val computed = argon2(password.getBytes("UTF-8"), salt, t, mem, p,
      tag.length, variant, version)
    java.security.MessageDigest.isEqual(computed, tag)
  }

  /** UTF8String surface for codegen. */
  def compareU(password: org.apache.spark.unsafe.types.UTF8String,
               hashed: org.apache.spark.unsafe.types.UTF8String): Boolean =
    compare(password.toString, hashed.toString)
}
