package graft.codec

import java.nio.ByteBuffer
import java.security.SecureRandom

/** Pluggable password-hashing codec — the determinism engine behind the
  * `mask_*` functions.
  *
  * Semantics match the reference trait `MaskDataTransformCodec`
  * (/root/reference/src/main/scala/ai/tripl/arc/udf/MaskDataPlugin.scala:126-154):
  *
  *  - `hash(value, deterministic=true, passphrase)`: split the passphrase
  *    bytes at the midpoint; append the FIRST half (bytes viewed as chars) to
  *    the value's chars, use the SECOND half as the KDF salt; KDF to 64 bytes.
  *  - `hash(value, deterministic=false, _)`: 64 bytes of `SecureRandom` —
  *    the input value is ignored entirely (reference quirk, SURVEY.md §2.6 Q2).
  *  - `hashLong`: first 8 bytes of `hash` as a SIGNED big-endian Long.
  */
trait Codec extends Serializable {
  val DEFAULT_HASH_LENGTH = 64

  def name: String
  def describe: String

  def encrypt(value: Array[Char], salt: Array[Byte]): Array[Byte]

  def hash(value: String, deterministic: Boolean, passphrase: Array[Byte]): Array[Byte] = {
    if (deterministic) {
      val (pass, salt) = passphrase.splitAt(passphrase.length / 2)
      encrypt(value.toCharArray ++ pass.map(_.toChar), salt)
    } else {
      val randomBytes = new Array[Byte](DEFAULT_HASH_LENGTH)
      Codec.secureRandom.get().nextBytes(randomBytes)
      randomBytes
    }
  }

  def hashLong(value: String, deterministic: Boolean, passphrase: Array[Byte]): Long =
    ByteBuffer.wrap(hash(value, deterministic, passphrase)).getLong
}

object Codec {
  private val secureRandom = ThreadLocal.withInitial(() => new SecureRandom())

  /** Env-var names follow the reference so existing deployments translate 1:1. */
  def envInt(name: String, default: Int): Int =
    sys.env.get(name).map(_.toInt).getOrElse(default)

  /** Built-in codecs plus any third-party [[Codec]] registered via
    * `META-INF/services/graft.codec.Codec` — the same drop-a-jar extension
    * surface as the reference's ServiceLoader-discovered codec plugins
    * (/root/reference/src/main/scala/ai/tripl/arc/udf/MaskDataPlugin.scala:41-45,
    * resources/META-INF/services/). Built-ins win on a name collision so an
    * external jar cannot silently replace the audited KDFs. */
  def all: List[Codec] = {
    val builtin = List(new Argon2Codec, new ScryptCodec, new Pbkdf2Codec)
    import scala.jdk.CollectionConverters._
    // context classloader first: that is where spark-submit --jars land
    val cl = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[Codec].getClassLoader)
    val discovered = java.util.ServiceLoader.load(classOf[Codec], cl).iterator().asScala.toList
    builtin ++ discovered.filterNot(d => builtin.exists(_.name == d.name))
  }

  /** Codec selected by ETL_CONF_MASK_DATA_CODEC (default Argon2). */
  def fromEnv: Codec = {
    val codecName = sys.env.getOrElse("ETL_CONF_MASK_DATA_CODEC", "Argon2")
    all.find(_.name == codecName).getOrElse(
      throw new Exception(s"'ETL_CONF_MASK_DATA_CODEC' codec '$codecName' not found."))
  }

  /** Passphrase from ETL_CONF_MASK_DATA_PASSPHRASE: mandatory, 64-256 chars
    * (reference MaskDataPlugin.scala:31-38). */
  def passphraseFromEnv: Array[Byte] = {
    val signature = "MaskDataTransform environment variable 'ETL_CONF_MASK_DATA_PASSPHRASE' must be a string of between 64 and 256 characters."
    sys.env.get("ETL_CONF_MASK_DATA_PASSPHRASE") match {
      case Some(value) if value.length < 64 || value.length > 256 => throw new Exception(signature)
      // pinned UTF-8: the platform-default overload would give two JVMs
      // with different file.encoding different key bytes for the same
      // passphrase — silently breaking cross-system deterministic masks
      case Some(value) => value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case None => throw new Exception(signature)
    }
  }
}

/** Argon2id — default codec. Tunables and defaults match the reference
  * (/root/reference/src/main/scala/ai/tripl/arc/transform/codec/Argon2.scala:11-17). */
class Argon2Codec(val parallelism: Int, val memory: Int, val iterations: Int) extends Codec {
  def this() = this(
    Codec.envInt("ETL_CONF_MASK_DATA_ARGON2_PARALLELISM", 2),
    Codec.envInt("ETL_CONF_MASK_DATA_ARGON2_MEMORY", 65536),
    Codec.envInt("ETL_CONF_MASK_DATA_ARGON2_ITERATIONS", 4))

  @transient private lazy val engine = new Argon2Engine(parallelism, memory, iterations)

  def name = "Argon2"
  def describe = s"Argon2($parallelism, $memory, $iterations)"

  // BouncyCastle's Argon2BytesGenerator UTF-8-encodes the char password
  // (PasswordConverter.UTF8) before hashing; replicate exactly.
  def encrypt(value: Array[Char], salt: Array[Byte]): Array[Byte] =
    engine.hash(new String(value).getBytes(java.nio.charset.StandardCharsets.UTF_8), salt, DEFAULT_HASH_LENGTH)
}

/** scrypt. Tunables and the reference's lossy `Char.toByte` password
  * conversion (/root/reference/.../codec/SCrypt.scala:25) replicated exactly. */
class ScryptCodec(val cpu: Int, val memory: Int, val parallelism: Int) extends Codec {
  def this() = this(
    Codec.envInt("ETL_CONF_MASK_DATA_SCRYPT_CPU", 16384),
    Codec.envInt("ETL_CONF_MASK_DATA_SCRYPT_MEMORY", 8),
    Codec.envInt("ETL_CONF_MASK_DATA_SCRYPT_PARALLELISM", 1))

  def name = "SCrypt"
  def describe = s"SCrypt($cpu, $memory, $parallelism)"

  def encrypt(value: Array[Char], salt: Array[Byte]): Array[Byte] =
    ScryptEngine.generate(value.map(_.toByte), salt, cpu, memory, parallelism, DEFAULT_HASH_LENGTH)
}

/** PBKDF2-HMAC-SHA512 via javax.crypto — same provider path as the reference
  * (/root/reference/.../codec/PBKDF2WithHmacSHA512.scala:20-32). */
class Pbkdf2Codec(val iterationCount: Int, val keyLength: Int) extends Codec {
  def this() = this(
    Codec.envInt("ETL_CONF_MASK_DATA_PBKDF2_ITERATIONS", 262144),
    Codec.envInt("ETL_CONF_MASK_DATA_PBKDF2_KEY_LENGTH", 64))

  def name = "PBKDF2WithHmacSHA512"
  def describe = s"PBKDF2WithHmacSHA512($iterationCount, $keyLength)"

  def encrypt(value: Array[Char], salt: Array[Byte]): Array[Byte] = {
    val factory = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA512")
    val keySpec = new javax.crypto.spec.PBEKeySpec(value, salt, iterationCount, keyLength * 8)
    val hash = factory.generateSecret(keySpec).getEncoded
    keySpec.clearPassword()
    hash
  }
}
