package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.MaskTransform

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 (or an
  * LLM-pipeline extension) over the driver's parquet tables. KDF outputs are
  * not computable in DuckDB, so masking queries return PROPERTY AGGREGATES
  * (row counts, null counts, bound checks, determinism self-equality) whose
  * expected values the DuckDB oracle derives from the unmasked base table.
  */
object SparkEntry {

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def maskMeta(treatments: String*): Metadata =
    new MetadataBuilder().putMetadata("mask",
      new MetadataBuilder().putStringArray("treatments", treatments.toArray).build()).build()

  /** Flagship: metadata-driven masking pipeline over sf0.001 customer —
    * the reference's end-to-end flow (typed source -> treatments in schema
    * metadata -> masking projection), driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Defaults.registerAll(spark)
    val customer = table(spark, "/root/testdata/sf0.001", "customer")
    val tagged = customer.select(
      customer("c_custkey"),
      customer("c_name").as("c_name", maskMeta("mask_string(16, true, ${value})")),
      customer("c_nationkey"),
      customer("c_acctbal").as("c_acctbal",
        maskMeta("mask_decimal(CAST(2.00 AS DECIMAL(4,2)), true, CAST(${value} AS DECIMAL(12,2)))")),
      customer("c_mktsegment"))
    MaskTransform(tagged)
  }

  // ---------------------------------------------------------------------
  // masking operator queries (F1-F6, O1-O4, V1-V2, distinct-prehash path)
  // ---------------------------------------------------------------------

  private def qMaskStringProps(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    table(spark, dir, "customer")
      .selectExpr(
        "c_name",
        "mask_string(16, true, c_name) AS m",
        "mask_string(16, true, c_name) AS m2",
        "mask_string_alphabet(12, '0123456789', true, c_name) AS mnum")
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_nonnull"),
        count(when(length(col("m")) === 16, 1)).as("n_len16"),
        count(when(col("m").rlike("^[A-Za-z]{16}$"), 1)).as("n_alpha"),
        count(when(col("m") === col("m2"), 1)).as("n_stable"),
        count(when(col("mnum").rlike("^[0-9]{12}$"), 1)).as("n_numeric"),
        countDistinct(col("c_name")).as("n_distinct_in"),
        countDistinct(col("m")).as("n_distinct_out"))
  }

  private def qMaskFormatProps(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    table(spark, dir, "customer")
      .selectExpr("mask_string_alphabet_format(16, '0123456789', '4xxx-xxxx-xxxx-xxxx', true, c_name) AS m")
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_nonnull"),
        count(when(col("m").rlike("^4[0-9]{3}-[0-9]{4}-[0-9]{4}-[0-9]{4}$"), 1)).as("n_formatted"))
  }

  private def qMaskDateProps(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    table(spark, dir, "orders")
      .selectExpr("CAST(o_orderdate AS DATE) AS orig", "mask_date(14, true, CAST(o_orderdate AS DATE)) AS m")
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_nonnull"),
        count(when(abs(datediff(col("m"), col("orig"))) < 14, 1)).as("n_inbounds"))
  }

  private def qMaskTimestampProps(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    table(spark, dir, "lineitem")
      .selectExpr("CAST(l_shipdate AS TIMESTAMP) AS orig", "mask_timestamp(14, true, CAST(l_shipdate AS TIMESTAMP)) AS m")
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_nonnull"),
        count(when(
          abs(unix_millis(col("m")) - unix_millis(col("orig"))) < lit(14L * 24 * 3600 * 1000) &&
            date_format(col("m"), "HH:mm:ss") === date_format(col("orig"), "HH:mm:ss"), 1)).as("n_inbounds"))
  }

  private def qMaskDecimalProps(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    table(spark, dir, "customer")
      .selectExpr(
        "CAST(c_acctbal AS DECIMAL(12,2)) AS orig",
        "mask_decimal(CAST(5.00 AS DECIMAL(4,2)), true, CAST(c_acctbal AS DECIMAL(12,2))) AS m")
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_nonnull"),
        count(when(abs(col("m") - col("orig")) < 5, 1)).as("n_inbounds"))
  }

  /** O1-O4 end-to-end: metadata-tagged projection with passthrough checks. */
  private def qMaskTransform(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    val customer = table(spark, dir, "customer")
    val tagged = customer.select(
      customer("c_custkey"),
      customer("c_name").as("c_name", maskMeta("mask_string(16, true, ${value})")),
      customer("c_acctbal").as("c_acctbal",
        maskMeta("mask_decimal(CAST(2.00 AS DECIMAL(4,2)), true, CAST(${value} AS DECIMAL(12,2)))")),
      customer("c_acctbal").as("c_acctbal_orig"),
      customer("c_mktsegment"))
    MaskTransform(tagged)
      .agg(
        count(lit(1)).as("n"),
        count(when(length(col("c_name")) === 16, 1)).as("n_name_masked"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        count(when(abs(col("c_acctbal") - col("c_acctbal_orig")) < 2, 1)).as("n_bal_inbounds"))
  }

  private def qMaskNameVocab(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    val vocab = graft.functions.Vocab.list("en-AU", "last_name").toSet
    val member = udf((s: String) => s != null && vocab.contains(s))
    table(spark, dir, "customer")
      .selectExpr("mask_name('last_name', true, c_name) AS m", "mask_name('last_name', true, c_name) AS m2")
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_nonnull"),
        count(when(member(col("m")), 1)).as("n_in_vocab"),
        count(when(col("m") === col("m2"), 1)).as("n_stable"))
  }

  private def qMaskEmailVocab(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    table(spark, dir, "customer")
      .selectExpr("mask_email(true, c_name) AS m")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("m").rlike("^[a-z]{12}@(gmail|yahoo|hotmail)\\.com$"), 1)).as("n_valid"))
  }

  /** Distinct-value pre-hash + broadcast join-back — the 100 TB scale path. */
  private def qMaskViaDistinct(spark: SparkSession, dir: String): DataFrame = {
    Defaults.registerAll(spark)
    val customer = table(spark, dir, "customer")
    MaskTransform.maskViaDistinct(customer, "c_name", c => expr(s"mask_string_det(16, `$c`)"))
      .agg(
        count(lit(1)).as("n"),
        count(col("c_name")).as("n_nonnull"),
        countDistinct(col("c_name")).as("n_distinct_out"))
  }

  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mask_string_props" -> qMaskStringProps,
    "mask_format_props" -> qMaskFormatProps,
    "mask_date_props" -> qMaskDateProps,
    "mask_timestamp_props" -> qMaskTimestampProps,
    "mask_decimal_props" -> qMaskDecimalProps,
    "mask_transform" -> qMaskTransform,
    "mask_name_vocab" -> qMaskNameVocab,
    "mask_email_vocab" -> qMaskEmailVocab,
    "mask_via_distinct" -> qMaskViaDistinct)

  /** DuckDB oracles: expected property values derived from the unmasked base
    * tables (the KDF itself is not DuckDB-expressible). */
  def oracleSql: Map[String, String] = Map(
    "mask_string_props" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_len16, " +
        "count(c_name) AS n_alpha, count(c_name) AS n_stable, count(c_name) AS n_numeric, " +
        "count(DISTINCT c_name) AS n_distinct_in, count(DISTINCT c_name) AS n_distinct_out FROM customer"),
    "mask_format_props" ->
      "SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_formatted FROM customer",
    "mask_date_props" ->
      "SELECT count(*) AS n, count(o_orderdate) AS n_nonnull, count(o_orderdate) AS n_inbounds FROM orders",
    "mask_timestamp_props" ->
      "SELECT count(*) AS n, count(l_shipdate) AS n_nonnull, count(l_shipdate) AS n_inbounds FROM lineitem",
    "mask_decimal_props" ->
      "SELECT count(*) AS n, count(c_acctbal) AS n_nonnull, count(c_acctbal) AS n_inbounds FROM customer",
    "mask_transform" ->
      ("SELECT count(*) AS n, count(c_name) AS n_name_masked, " +
        "count(DISTINCT c_mktsegment) AS n_segments, count(c_acctbal) AS n_bal_inbounds FROM customer"),
    "mask_name_vocab" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, count(c_name) AS n_in_vocab, " +
        "count(c_name) AS n_stable FROM customer"),
    "mask_email_vocab" ->
      "SELECT count(*) AS n, count(c_name) AS n_valid FROM customer",
    "mask_via_distinct" ->
      ("SELECT count(*) AS n, count(c_name) AS n_nonnull, " +
        "count(DISTINCT c_name) AS n_distinct_out FROM customer"))
}
