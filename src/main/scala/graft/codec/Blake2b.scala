package graft.codec

/** Pure-JVM BLAKE2b (RFC 7693), unkeyed, variable digest length 1-64 bytes.
  *
  * Needed by [[Argon2]] (RFC 9106 builds its H and H' functions on BLAKE2b).
  * Implemented from the RFC; no third-party crypto dependency is available in
  * this build (the reference uses BouncyCastle's Argon2BytesGenerator — see
  * /root/reference/src/main/scala/ai/tripl/arc/transform/codec/Argon2.scala:25-36).
  */
final class Blake2b(digestLength: Int) {
  require(digestLength >= 1 && digestLength <= 64, s"digest length $digestLength out of range")

  import Blake2b._

  private val h = new Array[Long](8)
  private val buf = new Array[Byte](128)
  private var bufLen = 0
  private var t0 = 0L // low 64 bits of byte counter
  private var t1 = 0L // high 64 bits

  reset()

  def reset(): Unit = {
    System.arraycopy(IV, 0, h, 0, 8)
    h(0) ^= 0x01010000L ^ digestLength.toLong // param block: fanout=1, depth=1, no key
    bufLen = 0
    t0 = 0L
    t1 = 0L
  }

  def update(data: Array[Byte]): Blake2b = update(data, 0, data.length)

  def update(data: Array[Byte], off: Int, len: Int): Blake2b = {
    var i = off
    val end = off + len
    while (i < end) {
      if (bufLen == 128) {
        incrementCounter(128)
        compress(buf, 0, last = false)
        bufLen = 0
      }
      val take = math.min(128 - bufLen, end - i)
      System.arraycopy(data, i, buf, bufLen, take)
      bufLen += take
      i += take
    }
    this
  }

  def digest(): Array[Byte] = {
    incrementCounter(bufLen)
    java.util.Arrays.fill(buf, bufLen, 128, 0.toByte)
    compress(buf, 0, last = true)
    val out = new Array[Byte](digestLength)
    var i = 0
    while (i < digestLength) {
      out(i) = (h(i >>> 3) >>> (8 * (i & 7))).toByte
      i += 1
    }
    reset()
    out
  }

  private def incrementCounter(n: Int): Unit = {
    t0 += n
    if (t0 == 0 && n > 0) t1 += 1 // carry (unsigned wrap)
  }

  private def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      m(i) = readLongLE(block, off + 8 * i)
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t0
    v(13) ^= t1
    if (last) v(14) = ~v(14)

    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) {
      h(i) ^= v(i) ^ v(i + 8)
      i += 1
    }
  }

  @inline private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
  }
}

object Blake2b {
  private[codec] val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL, 0xa54ff53a5f1d36f1L,
    0x510e527fade682d1L, 0x9b05688c2b3e6c1fL, 0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private[codec] val SIGMA: Array[Array[Int]] = Array(
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

  @inline def readLongLE(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) |
      ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) |
      ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) |
      ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)

  @inline def writeLongLE(v: Long, b: Array[Byte], off: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
    b(off + 4) = (v >>> 32).toByte
    b(off + 5) = (v >>> 40).toByte
    b(off + 6) = (v >>> 48).toByte
    b(off + 7) = (v >>> 56).toByte
  }

  def hash(digestLength: Int, data: Array[Byte]): Array[Byte] =
    new Blake2b(digestLength).update(data).digest()
}
