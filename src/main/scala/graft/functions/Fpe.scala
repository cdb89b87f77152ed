package graft.functions

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import graft.codec.Ff1

/** Format-preserving masking over an alphabet — the `mask_fpe` /
  * `unmask_fpe` SQL surface wrapping [[graft.codec.Ff1]] (NIST SP
  * 800-38G).
  *
  * Semantics, chosen for the PAN/SSN/account-number shape the masking
  * family exists for:
  *  - characters IN the alphabet form the FF1 message; characters
  *    OUTSIDE it (dashes, spaces, dots) pass through IN PLACE — so
  *    "4111-1111-1111-1111" masks to another "dddd-dddd-dddd-dddd"
  *    and a checksum-style separator layout survives masking.
  *  - output is over the SAME alphabet, SAME length, deterministic per
  *    (passphrase, tweak), and exactly invertible by [[unmask]] — the
  *    property the KDF family fundamentally cannot offer.
  *  - the TWEAK should name the field (SP 800-38G §8: tweaks are
  *    non-secret domain separators) so equal values in different
  *    columns mask differently.
  *  - null value -> null (the family's null-pass rule). A value whose
  *    in-alphabet subsequence is below the FF1 domain minimum (fewer
  *    than 2 chars, or radix^n < 100) also returns null: FAIL CLOSED —
  *    a masking function must never echo plaintext because the input
  *    was too short to cycle, and null is visible where a silent
  *    passthrough is a leak.
  *
  * Key derivation: AES-256 key = SHA-256(passphrase || fixed label).
  * The passphrase is the engine's existing masking secret
  * (ETL_CONF_MASK_DATA_PASSPHRASE); FPE needs a raw cipher key, not a
  * password hash, so a single SHA-256 expansion is the standard
  * construction (the KDF codecs exist to make GUESSING expensive;
  * here the key space is already 256 bits).
  */
object Fpe {

  /** AES-256 key from the masking passphrase; fixed public label for
    * domain separation from every other passphrase use in the engine. */
  def deriveKey(passphrase: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(passphrase)
    md.update("graft-ff1-key-v1".getBytes(StandardCharsets.US_ASCII))
    md.digest()
  }

  // alphabet -> (char -> digit) map, memoized: UDF args arrive per ROW,
  // and rebuilding a map per cell would dominate the cipher cost. Tiny
  // (distinct alphabets in a workload ~ a handful); bounded so a column
  // of per-row-varying alphabets degrades to recompute, never to an
  // unbounded executor heap.
  private val alphaCache = new ConcurrentHashMap[String, java.util.HashMap[Character, Integer]]()
  private val alphaCacheCap = 1024

  private def alphaMap(alphabet: String): java.util.HashMap[Character, Integer] = {
    val hit = alphaCache.get(alphabet)
    if (hit != null) return hit
    require(alphabet.length >= 2 && alphabet.length <= 65536,
      s"alphabet size ${alphabet.length} outside [2, 65536]")
    val m = new java.util.HashMap[Character, Integer](alphabet.length * 2)
    var i = 0
    while (i < alphabet.length) {
      require(m.put(alphabet.charAt(i), i) == null,
        s"alphabet has duplicate char '${alphabet.charAt(i)}'")
      i += 1
    }
    if (alphaCache.size < alphaCacheCap) alphaCache.putIfAbsent(alphabet, m)
    m
  }

  private def transform(value: String, alphabet: String, tweak: String,
                        key: Array[Byte], forward: Boolean): String = {
    if (value == null) return null
    val idx = alphaMap(alphabet)
    val n = value.length
    val positions = new Array[Int](n)
    val digits = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      val d = idx.get(value.charAt(i))
      if (d != null) { positions(k) = i; digits(k) = d.intValue(); k += 1 }
      i += 1
    }
    if (!Ff1.domainOk(alphabet.length, k)) return null // fail closed, never echo
    val msg = java.util.Arrays.copyOf(digits, k)
    val tw = if (tweak == null) Array.emptyByteArray
             else tweak.getBytes(StandardCharsets.UTF_8)
    val out = if (forward) Ff1.encrypt(key, tw, alphabet.length, msg)
              else Ff1.decrypt(key, tw, alphabet.length, msg)
    val sb = new StringBuilder(value)
    var j = 0
    while (j < k) { sb.setCharAt(positions(j), alphabet.charAt(out(j))); j += 1 }
    sb.toString
  }

  // key derived ONCE per closure, not per row
  def mask(passphrase: Array[Byte]): (String, String, String) => String = {
    val key = deriveKey(passphrase)
    (alphabet, tweak, value) => transform(value, alphabet, tweak, key, forward = true)
  }

  def unmask(passphrase: Array[Byte]): (String, String, String) => String = {
    val key = deriveKey(passphrase)
    (alphabet, tweak, value) => transform(value, alphabet, tweak, key, forward = false)
  }

  /** Register `mask_fpe(alphabet, tweak, value)` and its exact inverse
    * `unmask_fpe(alphabet, tweak, value)`. Both are PURE functions of
    * their arguments (FF1 is deterministic encryption), so they stay
    * Catalyst-deterministic — CSE and pushdown are safe, unlike the
    * SecureRandom masking path. */
  def register(spark: org.apache.spark.sql.SparkSession, passphrase: Array[Byte]): Unit = {
    import org.apache.spark.sql.functions.udf
    val m = mask(passphrase)
    val u = unmask(passphrase)
    spark.udf.register("mask_fpe",
      udf((alphabet: String, tweak: String, value: String) => m(alphabet, tweak, value)))
    spark.udf.register("unmask_fpe",
      udf((alphabet: String, tweak: String, value: String) => u(alphabet, tweak, value)))
  }
}
