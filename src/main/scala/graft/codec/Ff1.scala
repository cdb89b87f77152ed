package graft.codec

import java.math.BigInteger

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

/** NIST SP 800-38G FF1 format-preserving encryption (AES-based Feistel
  * cycling over radix strings) — the industry-standard answer to "mask a
  * PAN/SSN/account number so it still LOOKS like one": the ciphertext is
  * a same-length string over the same alphabet, deterministic under one
  * (key, tweak), and exactly invertible.
  *
  * This is the proper generalization of the reference's acknowledged
  * credit-card masking TODO
  * (/root/reference/src/main/scala/ai/tripl/arc/udf/MaskDataPlugin.scala:84
  * — the format argument the reference accepts and ignores) and of this
  * engine's own F3 template fill, which preserves SHAPE but not
  * reversibility or the standards trail. Implemented straight from the
  * published spec (NIST SP 800-38G, March 2016, Algorithms 7-8) on the
  * JDK's AES; validated against the official NIST FF1 sample vectors
  * (all nine: AES-128/192/256 × {no tweak, tweak, radix-36}) in Ff1Spec.
  *
  * Scale notes: one encryption is 10 Feistel rounds × (a CBC-MAC over
  * ~2-3 AES blocks + ≤2 AES expansion blocks) ≈ 30-50 AES block ops plus
  * small-BigInteger radix math — microseconds per cell on AES-NI
  * hardware, no per-row allocation beyond the digit arrays, Cipher
  * objects thread-local. Unlike the KDF masking family this is CHEAP by
  * design (FPE is encryption, not password hashing), so it needs no
  * memoization and no distinct-value rewrite at 100 TB.
  */
object Ff1 {

  private val tlCipher: ThreadLocal[Cipher] =
    ThreadLocal.withInitial(() => Cipher.getInstance("AES/ECB/NoPadding"))

  /** Spec bounds: radix in [2, 2^16], 2 <= n, radix^n >= 100 (SP 800-38G
    * §5.1; the minimum-domain guard against tiny-message table attacks). */
  def domainOk(radix: Int, n: Int): Boolean =
    radix >= 2 && radix <= 65536 && n >= 2 &&
      BigInteger.valueOf(radix).pow(n).compareTo(BigInteger.valueOf(100)) >= 0

  def encrypt(key: Array[Byte], tweak: Array[Byte], radix: Int,
              x: Array[Int]): Array[Int] = feistel(key, tweak, radix, x, forward = true)

  def decrypt(key: Array[Byte], tweak: Array[Byte], radix: Int,
              x: Array[Int]): Array[Int] = feistel(key, tweak, radix, x, forward = false)

  // NUM_radix over digits[from, until)
  private def numRadix(digits: Array[Int], from: Int, until: Int, radix: Int): BigInteger = {
    val r = BigInteger.valueOf(radix)
    var acc = BigInteger.ZERO
    var i = from
    while (i < until) { acc = acc.multiply(r).add(BigInteger.valueOf(digits(i))); i += 1 }
    acc
  }

  // STR_m_radix: m base-radix digits of x, most significant first
  private def strRadix(x: BigInteger, radix: Int, m: Int, out: Array[Int]): Unit = {
    val r = BigInteger.valueOf(radix)
    var v = x
    var i = m - 1
    while (i >= 0) {
      val qr = v.divideAndRemainder(r)
      out(i) = qr(1).intValueExact()
      v = qr(0)
      i -= 1
    }
  }

  // PRF(X) = final block of AES-CBC-MAC_K(X), zero IV (spec §4.5)
  private def prf(c: Cipher, blocks: Array[Byte], y: Array[Byte]): Unit = {
    java.util.Arrays.fill(y, 0.toByte)
    val x = new Array[Byte](16)
    var off = 0
    while (off < blocks.length) {
      var j = 0
      while (j < 16) { x(j) = (y(j) ^ blocks(off + j)).toByte; j += 1 }
      val enc = c.doFinal(x)
      System.arraycopy(enc, 0, y, 0, 16)
      off += 16
    }
  }

  // S = first d bytes of R || CIPH(R xor [1]^16) || CIPH(R xor [2]^16) || …
  private def expandS(c: Cipher, r: Array[Byte], d: Int): Array[Byte] = {
    if (d <= 16) return java.util.Arrays.copyOf(r, d)
    val out = new Array[Byte](d)
    System.arraycopy(r, 0, out, 0, 16)
    val blk = new Array[Byte](16)
    var j = 1
    var off = 16
    while (off < d) {
      java.util.Arrays.fill(blk, 0.toByte)
      var jj = j
      var k = 15
      while (jj != 0) { blk(k) = (jj & 0xff).toByte; jj >>>= 8; k -= 1 }
      var i = 0
      while (i < 16) { blk(i) = (blk(i) ^ r(i)).toByte; i += 1 }
      val enc = c.doFinal(blk)
      System.arraycopy(enc, 0, out, off, math.min(16, d - off))
      j += 1
      off += 16
    }
    out
  }

  private def feistel(key: Array[Byte], tweak: Array[Byte], radix: Int,
                      xs: Array[Int], forward: Boolean): Array[Int] = {
    val n = xs.length
    require(domainOk(radix, n),
      s"FF1 domain: radix in [2,65536], n >= 2, radix^n >= 100 (radix=$radix, n=$n)")
    require(key.length == 16 || key.length == 24 || key.length == 32,
      s"FF1 key must be AES-128/192/256, got ${key.length} bytes")
    var i0 = 0
    while (i0 < n) {
      require(xs(i0) >= 0 && xs(i0) < radix, s"digit ${xs(i0)} out of radix $radix")
      i0 += 1
    }
    val t = tweak.length
    val u = n / 2
    val v = n - u
    // b = ceil(ceil(v·log2 radix) / 8), computed EXACTLY as the bit length
    // of radix^v − 1 (floating log2 is off-by-ulp at exact powers of two)
    val b = (BigInteger.valueOf(radix).pow(v).subtract(BigInteger.ONE).bitLength + 7) / 8
    val d = 4 * ((b + 3) / 4) + 4

    val c = tlCipher.get()
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))

    // P (16 bytes, spec step 5) || Q (t + pad + 1 + b bytes, step 6i) —
    // assembled once; per round only the round byte and the NUM payload move
    val pad = Math.floorMod(-t - b - 1, 16)
    val buf = new Array[Byte](16 + t + pad + 1 + b)
    buf(0) = 1; buf(1) = 2; buf(2) = 1
    buf(3) = ((radix >> 16) & 0xff).toByte
    buf(4) = ((radix >> 8) & 0xff).toByte
    buf(5) = (radix & 0xff).toByte
    buf(6) = 10
    buf(7) = (u & 0xff).toByte
    buf(8) = ((n >> 24) & 0xff).toByte
    buf(9) = ((n >> 16) & 0xff).toByte
    buf(10) = ((n >> 8) & 0xff).toByte
    buf(11) = (n & 0xff).toByte
    buf(12) = ((t >> 24) & 0xff).toByte
    buf(13) = ((t >> 16) & 0xff).toByte
    buf(14) = ((t >> 8) & 0xff).toByte
    buf(15) = (t & 0xff).toByte
    System.arraycopy(tweak, 0, buf, 16, t)
    val roundByteAt = 16 + t + pad
    val numAt = roundByteAt + 1

    def putNum(x: BigInteger): Unit = {
      val bytes = x.toByteArray // big-endian, possibly with sign byte / short
      java.util.Arrays.fill(buf, numAt, numAt + b, 0.toByte)
      val srcOff = if (bytes.length > b) bytes.length - b else 0
      val len = math.min(bytes.length, b)
      System.arraycopy(bytes, srcOff, buf, numAt + b - len, len)
    }

    val rPow = Array(BigInteger.valueOf(radix).pow(u), BigInteger.valueOf(radix).pow(v))
    var a = java.util.Arrays.copyOfRange(xs, 0, u)
    var bArr = java.util.Arrays.copyOfRange(xs, u, n)
    val r = new Array[Byte](16)

    if (forward) {
      var i = 0
      while (i < 10) {
        val m = if (i % 2 == 0) u else v
        buf(roundByteAt) = i.toByte
        putNum(numRadix(bArr, 0, bArr.length, radix))
        prf(c, buf, r)
        val y = new BigInteger(1, expandS(c, r, d))
        val cNum = numRadix(a, 0, a.length, radix).add(y).mod(rPow(i % 2))
        val cArr = new Array[Int](m)
        strRadix(cNum, radix, m, cArr)
        a = bArr
        bArr = cArr
        i += 1
      }
    } else {
      var i = 9
      while (i >= 0) {
        val m = if (i % 2 == 0) u else v
        buf(roundByteAt) = i.toByte
        putNum(numRadix(a, 0, a.length, radix))
        prf(c, buf, r)
        val y = new BigInteger(1, expandS(c, r, d))
        val cNum = numRadix(bArr, 0, bArr.length, radix).subtract(y).mod(rPow(i % 2))
        val cArr = new Array[Int](m)
        strRadix(cNum, radix, m, cArr)
        bArr = a
        a = cArr
        i -= 1
      }
    }
    val out = new Array[Int](n)
    System.arraycopy(a, 0, out, 0, a.length)
    System.arraycopy(bArr, 0, out, a.length, bArr.length)
    out
  }
}
