package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven typing of raw (string-ish) sources — the capability the
  * reference consumes from its host framework's typing stage (the
  * `userdata.json` schema format: per-column `type`, `trim`,
  * `nullableValues`, `formatters`, `timezoneId`, and free-form `metadata`
  * including `mask.treatments` — see SURVEY.md §1.2). With this, the
  * reference's end-to-end flow (delimited extract -> typing -> masking) runs
  * natively: `TypedSource.readCsv(...) |> MaskTransform.apply`.
  *
  * All conversions are Column expressions (codegen'd, null-safe); the
  * projection is narrow and keeps partitioning.
  */
object TypedSource {

  /** One column's typing rule.
    *
    * @param dataType   "string" | "integer" | "long" | "double" | "boolean" |
    *                   "decimal(p,s)" | "date" | "timestamp" | "time"
    *                   ("time" is a logical type carried as string, like the
    *                   reference fixture)
    * @param formatters date/timestamp patterns tried left-to-right (Java
    *                   time style; `uuuu` is accepted and mapped to `yyyy`)
    */
  case class ColumnSpec(
      name: String,
      dataType: String = "string",
      trim: Boolean = false,
      nullableValues: Seq[String] = Nil,
      formatters: Seq[String] = Nil,
      timezoneId: Option[String] = None,
      metadata: Metadata = Metadata.empty)

  private val DecimalRe = """decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private def normalizePattern(p: String): String = p.replace("uuuu", "yyyy")

  /** Typing expression for one column over its raw string form. */
  def typingExpr(spec: ColumnSpec): Column = {
    val raw = col(s"`${spec.name}`").cast("string")
    val trimmed = if (spec.trim) trim(raw) else raw
    val nulled =
      if (spec.nullableValues.isEmpty) trimmed
      else when(trimmed.isin(spec.nullableValues: _*), lit(null)).otherwise(trimmed)

    // Spark 4 runs ANSI mode by default: a plain cast or to_date throws on
    // the first malformed value instead of yielding null, which breaks both
    // messy-source typing and the multi-formatter fallback (the first
    // non-matching pattern would kill the job before the next one is tried).
    // try_cast / try_to_timestamp give the lenient semantics typing needs.
    def tryCast(c: Column, dt: DataType): Column = c.try_cast(dt)
    val typed: Column = spec.dataType.toLowerCase match {
      case "string" | "time" => nulled
      case "integer" | "int" => tryCast(nulled, IntegerType)
      case "long" => tryCast(nulled, LongType)
      case "double" => tryCast(nulled, DoubleType)
      case "boolean" => tryCast(nulled, BooleanType)
      case DecimalRe(p, s) => tryCast(nulled, DecimalType(p.toInt, s.toInt))
      case "date" =>
        if (spec.formatters.isEmpty) tryCast(nulled, DateType)
        else coalesce(spec.formatters.map(f =>
          try_to_timestamp(nulled, lit(normalizePattern(f))).cast(DateType)): _*)
      case "timestamp" =>
        val exprs =
          if (spec.formatters.isEmpty) Seq(tryCast(nulled, TimestampType))
          else spec.formatters.map(f => try_to_timestamp(nulled, lit(normalizePattern(f))))
        val ts = coalesce(exprs: _*)
        // timezoneId shifts a source-local timestamp into session time
        spec.timezoneId.fold(ts)(tz => to_utc_timestamp(ts, tz))
      case other => throw new Exception(s"field '${spec.name}' has unknown type '$other'")
    }
    typed.as(spec.name, spec.metadata)
  }

  /** Apply typing rules; unspecified columns pass through untouched. */
  def typed(raw: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val bySpec = specs.map(s => s.name -> s).toMap
    val cols = raw.columns.map { c =>
      bySpec.get(c).map(typingExpr).getOrElse(col(s"`$c`"))
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  /** Delimited extract + typing in one step (header row expected). */
  def readCsv(spark: SparkSession, path: String, specs: Seq[ColumnSpec],
              delimiter: String = ","): DataFrame =
    typed(spark.read.option("header", "true").option("delimiter", delimiter).csv(path), specs)
}
