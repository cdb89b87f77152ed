package graft.functions

import org.apache.spark.sql.SparkSession

import graft.codec.Codec

/** Registers the `mask_*` SQL function family on a SparkSession.
  *
  * API surface matches the reference plugin registration
  * (/root/reference/src/main/scala/ai/tripl/arc/udf/MaskDataPlugin.scala:60-65):
  *
  *   mask_string(length INT, deterministic BOOL, value STRING) -> STRING
  *   mask_string_alphabet(length INT, alphabet STRING, deterministic BOOL, value STRING) -> STRING
  *   mask_string_alphabet_format(length INT, alphabet STRING, format STRING, deterministic BOOL, value STRING) -> STRING
  *   mask_date(range INT, deterministic BOOL, value DATE) -> DATE
  *   mask_timestamp(range INT, deterministic BOOL, value TIMESTAMP) -> TIMESTAMP
  *   mask_decimal(range DECIMAL, deterministic BOOL, value DECIMAL) -> DECIMAL
  *
  * All are registered `asNondeterministic`: with `deterministic=false` the
  * reference's hash is pure SecureRandom, and Catalyst must not CSE,
  * re-execute, or reorder such calls (the reference registers them as plain
  * deterministic UDFs — a latent correctness bug, SURVEY.md §2.6 Q2). For
  * deterministic-by-construction pipelines that want Catalyst optimizations,
  * `mask_*_det` twins are registered WITHOUT the nondeterministic flag; they
  * hard-wire deterministic=true.
  */
object MaskUdfs {

  /** Register with codec + passphrase resolved from the environment
    * (ETL_CONF_MASK_DATA_*), like the reference plugin. */
  def register(spark: SparkSession): Unit =
    register(spark, Codec.fromEnv, Codec.passphraseFromEnv)

  def register(spark: SparkSession, codec: Codec, passphrase: Array[Byte]): Unit = {
    import org.apache.spark.sql.functions.udf

    val java8 = spark.conf.getOption("spark.sql.datetime.java8API.enabled").forall(_.toBoolean)

    val fString = MaskFunctions.maskString(codec, passphrase) _

    spark.udf.register("mask_string",
      udf((length: Int, deterministic: Boolean, value: String) =>
        fString(length, MaskFunctions.DefaultAlphabet, None, deterministic, value)).asNondeterministic())
    spark.udf.register("mask_string_alphabet",
      udf((length: Int, alphabet: String, deterministic: Boolean, value: String) =>
        fString(length, alphabet, None, deterministic, value)).asNondeterministic())
    spark.udf.register("mask_string_alphabet_format",
      udf((length: Int, alphabet: String, format: String, deterministic: Boolean, value: String) =>
        fString(length, alphabet, Option(format), deterministic, value)).asNondeterministic())

    if (java8) {
      spark.udf.register("mask_date",
        udf((range: Int, deterministic: Boolean, value: java.time.LocalDate) =>
          MaskFunctions.maskLocalDate(codec, passphrase)(range, deterministic, value)).asNondeterministic())
      spark.udf.register("mask_timestamp",
        udf((range: Int, deterministic: Boolean, value: java.time.Instant) =>
          MaskFunctions.maskInstant(codec, passphrase)(range, deterministic, value)).asNondeterministic())
    } else {
      spark.udf.register("mask_date",
        udf((range: Int, deterministic: Boolean, value: java.sql.Date) =>
          MaskFunctions.maskDate(codec, passphrase)(range, deterministic, value)).asNondeterministic())
      spark.udf.register("mask_timestamp",
        udf((range: Int, deterministic: Boolean, value: java.sql.Timestamp) =>
          MaskFunctions.maskTimestamp(codec, passphrase)(range, deterministic, value)).asNondeterministic())
    }

    spark.udf.register("mask_decimal",
      udf((range: java.math.BigDecimal, deterministic: Boolean, value: java.math.BigDecimal) =>
        MaskFunctions.maskDecimal(codec, passphrase)(range, deterministic, value)).asNondeterministic())

    // deterministic twins: safe for CSE/pushdown, usable as join keys
    spark.udf.register("mask_string_det",
      udf((length: Int, value: String) =>
        fString(length, MaskFunctions.DefaultAlphabet, None, true, value)))
    if (java8) {
      spark.udf.register("mask_date_det",
        udf((range: Int, value: java.time.LocalDate) =>
          MaskFunctions.maskLocalDate(codec, passphrase)(range, true, value)))
      spark.udf.register("mask_timestamp_det",
        udf((range: Int, value: java.time.Instant) =>
          MaskFunctions.maskInstant(codec, passphrase)(range, true, value)))
    } else {
      spark.udf.register("mask_date_det",
        udf((range: Int, value: java.sql.Date) =>
          MaskFunctions.maskDate(codec, passphrase)(range, true, value)))
      spark.udf.register("mask_timestamp_det",
        udf((range: Int, value: java.sql.Timestamp) =>
          MaskFunctions.maskTimestamp(codec, passphrase)(range, true, value)))
    }
    spark.udf.register("mask_decimal_det",
      udf((range: java.math.BigDecimal, value: java.math.BigDecimal) =>
        MaskFunctions.maskDecimal(codec, passphrase)(range, true, value)))
  }
}
