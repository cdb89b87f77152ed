package graft.codec

/** Test-classpath third-party codec, discovered ONLY via
  * META-INF/services/graft.codec.Codec (src/test/resources) — proves the
  * ServiceLoader extension surface without touching the built-in list.
  * Deliberately trivial (NOT a KDF): SHA-512 of password||salt. */
class TestVectorCodec extends Codec {
  def name = "TestVector"
  def describe = "TestVector()"

  def encrypt(value: Array[Char], salt: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-512")
    md.update(new String(value).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.update(salt)
    md.digest()
  }
}
