package graft.codec

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

/** Pure-JVM scrypt (RFC 7914) on the JDK's PBKDF2WithHmacSHA256.
  *
  * The reference delegates to BouncyCastle's `SCrypt.generate`
  * (/root/reference/src/main/scala/ai/tripl/arc/transform/codec/SCrypt.scala:25-31),
  * which is an implementation of the same RFC, so outputs are byte-identical.
  */
object ScryptEngine {

  /** scrypt(P, S, N, r, p, dkLen). N must be a power of two > 1. */
  def generate(password: Array[Byte], salt: Array[Byte], n: Int, r: Int, p: Int, dkLen: Int): Array[Byte] = {
    require(n > 1 && (n & (n - 1)) == 0, "N must be a power of 2 greater than 1")
    val blockSize = 128 * r
    val b = pbkdf2Sha256(password, salt, 1, p * blockSize)
    var i = 0
    while (i < p) {
      roMix(b, i * blockSize, n, r)
      i += 1
    }
    pbkdf2Sha256(password, b, 1, dkLen)
  }

  // PBKDF2 over a hand-rolled HMAC-SHA256: javax.crypto's PBEKeySpec takes
  // chars (and UTF-8s them, losing raw bytes >127) and SecretKeySpec rejects
  // empty keys, which the RFC 7914 test vectors require.
  private def pbkdf2Sha256(password: Array[Byte], salt: Array[Byte], iterations: Int, keyLen: Int): Array[Byte] = {
    val hmac = new HmacSha256(password)
    val hLen = 32
    val blocks = (keyLen + hLen - 1) / hLen
    val out = new Array[Byte](blocks * hLen)
    val intBuf = new Array[Byte](4)
    var blk = 1
    while (blk <= blocks) {
      intBuf(0) = (blk >>> 24).toByte
      intBuf(1) = (blk >>> 16).toByte
      intBuf(2) = (blk >>> 8).toByte
      intBuf(3) = blk.toByte
      var u = hmac.compute(salt, intBuf)
      val t = u.clone()
      var iter = 1
      while (iter < iterations) {
        u = hmac.compute(u)
        var k = 0
        while (k < hLen) { t(k) = (t(k) ^ u(k)).toByte; k += 1 }
        iter += 1
      }
      System.arraycopy(t, 0, out, (blk - 1) * hLen, hLen)
      blk += 1
    }
    java.util.Arrays.copyOf(out, keyLen)
  }

  /** HMAC-SHA256 (RFC 2104) on MessageDigest; supports empty keys. */
  private final class HmacSha256(key: Array[Byte]) {
    private val md = java.security.MessageDigest.getInstance("SHA-256")
    private val k0: Array[Byte] =
      if (key.length > 64) java.util.Arrays.copyOf(md.digest(key), 64)
      else java.util.Arrays.copyOf(key, 64)
    private val ipad: Array[Byte] = k0.map(b => (b ^ 0x36).toByte)
    private val opad: Array[Byte] = k0.map(b => (b ^ 0x5c).toByte)
    def compute(parts: Array[Byte]*): Array[Byte] = {
      md.reset()
      md.update(ipad)
      parts.foreach(md.update)
      val inner = md.digest()
      md.update(opad)
      md.digest(inner)
    }
  }

  // scryptROMix over the 128*r-byte block at b[off, off+128r)
  private def roMix(b: Array[Byte], off: Int, n: Int, r: Int): Unit = {
    val words = 32 * r // u32 words per block
    val x = new Array[Int](words)
    var i = 0
    while (i < words) { x(i) = readIntLE(b, off + 4 * i); i += 1 }

    val v = new Array[Int](n * words)
    val y = new Array[Int](words)
    val t = new Array[Int](16)

    i = 0
    while (i < n) {
      System.arraycopy(x, 0, v, i * words, words)
      blockMix(x, y, t, r)
      i += 1
    }
    i = 0
    while (i < n) {
      // Integerify: LE integer from the LAST 64-byte sub-block, mod N.
      // N is a power of two, so only the low word's low bits matter.
      val j = x(words - 16) & (n - 1)
      val vOff = j * words
      var k = 0
      while (k < words) { x(k) ^= v(vOff + k); k += 1 }
      blockMix(x, y, t, r)
      i += 1
    }

    i = 0
    while (i < words) { writeIntLE(x(i), b, off + 4 * i); i += 1 }
  }

  // scryptBlockMix: x is 2r 16-word sub-blocks; result written back into x.
  private def blockMix(x: Array[Int], y: Array[Int], t: Array[Int], r: Int): Unit = {
    val subBlocks = 2 * r
    // X = B[2r-1]
    System.arraycopy(x, (subBlocks - 1) * 16, t, 0, 16)
    var i = 0
    while (i < subBlocks) {
      var k = 0
      val srcOff = i * 16
      while (k < 16) { t(k) ^= x(srcOff + k); k += 1 }
      salsa208(t)
      // Y_i goes to position: even i -> i/2, odd i -> r + i/2
      val dst = (if ((i & 1) == 0) i / 2 else r + i / 2) * 16
      System.arraycopy(t, 0, y, dst, 16)
      i += 1
    }
    System.arraycopy(y, 0, x, 0, subBlocks * 16)
  }

  /** Salsa20/8 core over 16 u32 words, in place (RFC 7914 §3). */
  private def salsa208(b: Array[Int]): Unit = {
    val x = new Array[Int](16)
    System.arraycopy(b, 0, x, 0, 16)
    var i = 0
    while (i < 4) { // 4 double-rounds = 8 rounds
      // column round
      x(4) ^= Integer.rotateLeft(x(0) + x(12), 7); x(8) ^= Integer.rotateLeft(x(4) + x(0), 9)
      x(12) ^= Integer.rotateLeft(x(8) + x(4), 13); x(0) ^= Integer.rotateLeft(x(12) + x(8), 18)
      x(9) ^= Integer.rotateLeft(x(5) + x(1), 7); x(13) ^= Integer.rotateLeft(x(9) + x(5), 9)
      x(1) ^= Integer.rotateLeft(x(13) + x(9), 13); x(5) ^= Integer.rotateLeft(x(1) + x(13), 18)
      x(14) ^= Integer.rotateLeft(x(10) + x(6), 7); x(2) ^= Integer.rotateLeft(x(14) + x(10), 9)
      x(6) ^= Integer.rotateLeft(x(2) + x(14), 13); x(10) ^= Integer.rotateLeft(x(6) + x(2), 18)
      x(3) ^= Integer.rotateLeft(x(15) + x(11), 7); x(7) ^= Integer.rotateLeft(x(3) + x(15), 9)
      x(11) ^= Integer.rotateLeft(x(7) + x(3), 13); x(15) ^= Integer.rotateLeft(x(11) + x(7), 18)
      // row round
      x(1) ^= Integer.rotateLeft(x(0) + x(3), 7); x(2) ^= Integer.rotateLeft(x(1) + x(0), 9)
      x(3) ^= Integer.rotateLeft(x(2) + x(1), 13); x(0) ^= Integer.rotateLeft(x(3) + x(2), 18)
      x(6) ^= Integer.rotateLeft(x(5) + x(4), 7); x(7) ^= Integer.rotateLeft(x(6) + x(5), 9)
      x(4) ^= Integer.rotateLeft(x(7) + x(6), 13); x(5) ^= Integer.rotateLeft(x(4) + x(7), 18)
      x(11) ^= Integer.rotateLeft(x(10) + x(9), 7); x(8) ^= Integer.rotateLeft(x(11) + x(10), 9)
      x(9) ^= Integer.rotateLeft(x(8) + x(11), 13); x(10) ^= Integer.rotateLeft(x(9) + x(8), 18)
      x(12) ^= Integer.rotateLeft(x(15) + x(14), 7); x(13) ^= Integer.rotateLeft(x(12) + x(15), 9)
      x(14) ^= Integer.rotateLeft(x(13) + x(12), 13); x(15) ^= Integer.rotateLeft(x(14) + x(13), 18)
      i += 1
    }
    i = 0
    while (i < 16) { b(i) += x(i); i += 1 }
  }

  @inline private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  @inline private def writeIntLE(v: Int, b: Array[Byte], off: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }
}
