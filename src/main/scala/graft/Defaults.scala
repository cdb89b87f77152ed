package graft

import org.apache.spark.sql.SparkSession

import graft.codec.{Codec, Pbkdf2Codec}
import graft.functions.{MaskUdfs, Vocab}

/** Session wiring for DRIVER-RUN entry points ONLY (Verify/Bench run with no
  * env configured). Env vars win when present; otherwise a fixed test profile
  * is used: PBKDF2 at 1024 iterations — cheap enough to run per-round over
  * sf0.1 while exercising the production code path. (The KDF strength is a
  * config knob, not a code path: Argon2id at production cost is selected
  * purely via env.)
  *
  * The production packaging ([[GraftExtensions]]) does NOT use this fallback:
  * it fails closed on missing ETL_CONF_MASK_DATA_* configuration like the
  * reference, because a silent fallback to a repo-published passphrase would
  * make deterministic masks dictionary-reversible.
  */
object Defaults {

  val testPassphrase: Array[Byte] =
    "graft-spark-masking-default-test-passphrase-0123456789abcdefghij".getBytes // 64 chars

  def passphrase: Array[Byte] =
    if (sys.env.contains("ETL_CONF_MASK_DATA_PASSPHRASE")) Codec.passphraseFromEnv else testPassphrase

  def codec: Codec =
    if (sys.env.contains("ETL_CONF_MASK_DATA_CODEC")) Codec.fromEnv else new Pbkdf2Codec(1024, 64)

  /** Register every graft SQL function on the session (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val c = codec
    val pp = passphrase
    MaskUdfs.register(spark, c, pp)
    Vocab.register(spark, c, pp)
    graft.functions.Fpe.register(spark, pp)
  }
}
