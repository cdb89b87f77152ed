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

  /** Spark's parser rejects day-of-week symbols during PARSING ('E' is
    * format-only since the Proleptic Gregorian switch); the day name is
    * redundant for reconstructing the instant, so a leading "EEE " is
    * stripped from both the pattern and the value (reference fixture shape:
    * "Wed Aug 17 1983 21:57:14 GMT+1000 (...)"). */
  private def stripDayOfWeek(value: Column, pattern: String): (Column, String) =
    if (pattern.startsWith("EEE "))
      (regexp_replace(value, "^[A-Za-z]{3} ", ""), pattern.substring(4))
    else (value, pattern)

  /** Typing expression for one column over its raw string form. */
  def typingExpr(spec: ColumnSpec): Column = typingExpr(spec, spec.name)

  /** Typing expression reading from `sourceColumn` (raw header) and emitting
    * `spec.name` — the positional form used when source headers differ from
    * schema names ("Date Of Birth" -> birth_date). */
  def typingExpr(spec: ColumnSpec, sourceColumn: String): Column = {
    val raw = col(s"`$sourceColumn`").cast("string")
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
        else coalesce(spec.formatters.map { f =>
          val (v, p) = stripDayOfWeek(nulled, normalizePattern(f))
          try_to_timestamp(v, lit(p)).cast(DateType)
        }: _*)
      case "timestamp" =>
        val exprs =
          if (spec.formatters.isEmpty) Seq(tryCast(nulled, TimestampType))
          else spec.formatters.map { f =>
            val (v, p) = stripDayOfWeek(nulled, normalizePattern(f))
            try_to_timestamp(v, lit(p))
          }
        val ts = coalesce(exprs: _*)
        // timezoneId reinterprets the parsed NAIVE wall time as being in
        // the source zone. to_utc_timestamp treats the SESSION-LOCAL
        // rendering as tz-local, so the instant is only correct when the
        // session timezone is UTC — the convention every entry point in
        // this repo pins (Bench/Verify/ScaleCheck/SparkTestBase) — and an
        // offset-BEARING value must not also set timezoneId (it would
        // shift twice). Both stated here rather than silently wrong.
        spec.timezoneId.fold(ts)(tz => to_utc_timestamp(ts, tz))
      case other => throw new Exception(s"field '${spec.name}' has unknown type '$other'")
    }
    typed.as(spec.name, spec.metadata)
  }

  /** Apply typing rules; unspecified columns pass through untouched.
    * Every spec must MATCH a raw column: a typo'd schema field previously
    * just vanished — leaving the column untyped and, worse, its
    * mask.treatments metadata unattached, so the downstream masking stage
    * would ship that column as plaintext with no error anywhere. */
  def typed(raw: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    val missing = specs.map(_.name).filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"typing specs match no source column: ${missing.mkString(", ")} " +
        s"(source columns: ${raw.columns.mkString(", ")}; use typedPositional for renames)")
    val bySpec = specs.map(s => s.name -> s).toMap
    val cols = raw.columns.map { c =>
      bySpec.get(c).map(typingExpr).getOrElse(col(s"`$c`"))
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  /** Positional typing: spec i applies to raw column i and renames it — the
    * reference's typing-stage contract where source headers differ from the
    * schema's field names (userdata.csv "Date Of Birth" -> birth_date). */
  def typedPositional(raw: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    require(raw.columns.length == specs.length,
      s"positional typing needs exactly ${specs.length} source columns, got ${raw.columns.length}")
    raw.select(raw.columns.toIndexedSeq.zip(specs).map { case (c, s) => typingExpr(s, c) }: _*)
  }

  /** Delimited extract + typing in one step (header row expected). */
  def readCsv(spark: SparkSession, path: String, specs: Seq[ColumnSpec],
              delimiter: String = ","): DataFrame =
    typed(spark.read.option("header", "true").option("delimiter", delimiter).csv(path), specs)

  /** Delimited extract + POSITIONAL typing (headers differ from schema). */
  def readCsvPositional(spark: SparkSession, path: String, specs: Seq[ColumnSpec],
                        delimiter: String = ","): DataFrame =
    typedPositional(spark.read.option("header", "true").option("delimiter", delimiter).csv(path), specs)

  /** JSON-lines extract + typing. Fields are read as STRINGS first (a
    * schema of all-string columns in spec order) so the typing rules —
    * nullableValues, formatters, try-casts — apply uniformly to JSON and
    * delimited sources rather than trusting Spark's JSON inference. */
  def readJson(spark: SparkSession, path: String, specs: Seq[ColumnSpec]): DataFrame = {
    val asStrings = StructType(specs.map(s => StructField(s.name, StringType, nullable = true)))
    typed(spark.read.schema(asStrings).json(path), specs)
  }

  /** Parse the reference's typing-schema JSON format (the `userdata.json`
    * shape: an array of field objects with `name`/`type`/`trim`/
    * `nullableValues`/`formatters`/`timezoneId`/`precision`/`scale` and a
    * free-form `metadata` object that may carry `mask.treatments`) into
    * [[ColumnSpec]]s — a reference deployment's existing schema files work
    * unchanged. Errors accumulate across fields like the stage config. */
  def specsFromJson(json: String): Either[List[String], Seq[ColumnSpec]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parseOpt(json) match {
      case Some(JArray(fields)) =>
        val parsed = fields.zipWithIndex.map {
          case (JObject(kvs), idx) =>
            val m = kvs.toMap
            def str(k: String): Option[String] = m.get(k).collect { case JString(s) => s }
            def bool(k: String): Boolean = m.get(k).collect { case JBool(b) => b }.getOrElse(false)
            def strList(k: String): Seq[String] = m.get(k) match {
              case Some(JArray(xs)) => xs.collect { case JString(s) => s }
              case _ => Nil
            }
            def int(k: String): Option[Int] = m.get(k).collect { case JInt(i) => i.toInt }
            str("name") match {
              case None => Left(s"field $idx: missing required attribute 'name'.")
              case Some(name) =>
                val baseType = str("type").getOrElse("string")
                val dataType = baseType.toLowerCase match {
                  case "decimal" =>
                    s"decimal(${int("precision").getOrElse(38)},${int("scale").getOrElse(18)})"
                  case other => other
                }
                // free-form metadata rides through Spark's own JSON codec, so
                // mask.treatments (and anything else) survives verbatim
                val metadata = m.get("metadata") match {
                  case Some(obj: JObject) =>
                    Metadata.fromJson(JsonMethods.compact(JsonMethods.render(obj)))
                  case _ => Metadata.empty
                }
                Right(ColumnSpec(
                  name = name,
                  dataType = dataType,
                  trim = bool("trim"),
                  nullableValues = strList("nullableValues"),
                  formatters = strList("formatters"),
                  timezoneId = str("timezoneId"),
                  metadata = metadata))
            }
          case (_, idx) => Left(s"field $idx: must be a JSON object.")
        }
        val errors = parsed.collect { case Left(e) => e }
        if (errors.nonEmpty) Left(errors) else Right(parsed.collect { case Right(s) => s })
      case _ => Left(List("typing schema must be a JSON array of field objects"))
    }
  }
}
