package graft.operators

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, DecimalType}
import org.apache.spark.storage.StorageLevel

/** Metadata-driven masking projection — the reference's one relational
  * operator (O1-O6, /root/reference/src/main/scala/ai/tripl/arc/transform/MaskDataTransform.scala:107-173),
  * re-expressed as a pure `DataFrame => DataFrame` over Column trees.
  *
  * The masking program lives in the schema: any column whose metadata carries
  * `mask: { treatments: [...] }` is replaced by the composition of its
  * treatment expressions; all other columns pass through untouched. Each
  * treatment is a SQL expression template with a `${value}` placeholder; the
  * first gets the column, each subsequent one gets the previous expression
  * (left-to-right fold — reference :118-124). Example metadata:
  *
  * {{{
  *   {"mask": {"treatments": ["date_trunc('HOUR', ${value})",
  *                            "mask_timestamp(14, true, ${value})"]}}
  * }}}
  *
  * Deliberate upgrades over the reference (SURVEY.md §2.6):
  *  - Columns are built as `Column` trees and the projection runs through
  *    `df.select`, not string-built SQL + `spark.sql` — Catalyst sees through
  *    it (pushdown/pruning survive), and odd column names are backquoted (Q5).
  *  - The final expression is cast back to the ORIGINAL field type for every
  *    type, not just decimal/date (Q4) — the reference leaves e.g. a
  *    timestamp treatment's type drift unchecked.
  *  - Column metadata is re-attached via the select itself (alias-with-
  *    metadata), so no second pass over the plan is needed (O4).
  *
  * Scale note: this operator is a narrow projection — it preserves
  * partitioning, incurs no shuffle, and whole-stage codegen fuses the
  * non-UDF parts. The per-cell KDF cost is addressed at the function layer
  * (per-executor memoization) and by [[MaskTransform.maskViaDistinct]] for
  * low-cardinality columns.
  */
object MaskTransform {
  val MaskKey = "mask"
  val TreatmentsKey = "treatments"
  private val Placeholder = "${value}"

  /** Compose the treatment templates for one column into a single SQL
    * expression string (textual fold, `${value}` substitution). */
  def composeTreatments(columnName: String, treatments: Seq[String]): String =
    treatments.foldLeft("") { (state, treatment) =>
      val current = if (state.isEmpty) s"`$columnName`" else state
      treatment.replace(Placeholder, current)
    }

  /** The masking projection as Column trees; pure, lazy, no side effects. */
  def apply(df: DataFrame): DataFrame = {
    val columns: Array[Column] = df.schema.fields.map { field =>
      if (field.metadata.contains(MaskKey)) {
        Try(field.metadata.getMetadata(MaskKey)) match {
          case Failure(_) =>
            throw new Exception(s"field '${field.name}' has invalid type for '$MaskKey'.")
          case Success(mask) =>
            Try(mask.getStringArray(TreatmentsKey)) match {
              case Failure(_) =>
                throw new Exception(s"field '${field.name}' is missing treatments key '$TreatmentsKey'")
              case Success(treatments) =>
                val composed = expr(composeTreatments(field.name, treatments.toSeq))
                castBack(composed, field.dataType)
                  .as(field.name, field.metadata)
            }
        }
      } else col(s"`${field.name}`")
    }
    df.select(columns.toIndexedSeq: _*)
  }

  /** Re-assert the original column type after the treatment chain. The
    * reference only covers decimal (preserving precision/scale) and date;
    * we cast uniformly (its behavior is a strict subset). */
  private def castBack(c: Column, dt: DataType): Column = dt match {
    case d: DecimalType => c.cast(DecimalType(d.precision, d.scale))
    case other => c.cast(other)
  }

  /** Stage wrapper with the reference's dataflow contract: read a named view,
    * mask, publish the output view, optionally persist + instrument
    * (records + rate, O5-O6). Returns the output frame and the stage detail
    * map the reference logs. */
  def runStage(
      spark: org.apache.spark.sql.SparkSession,
      inputView: String,
      outputView: String,
      persist: Boolean = false,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER,
      immutableViews: Boolean = false): (DataFrame, Map[String, Any]) = {
    val outputDF = apply(spark.table(inputView))
    if (immutableViews) outputDF.createTempView(outputView)
    else outputDF.createOrReplaceTempView(outputView)

    var detail = Map[String, Any]("inputView" -> inputView, "outputView" -> outputView)
    if (!outputDF.isStreaming) {
      detail += ("outputColumns" -> outputDF.schema.length)
      // .rdd forces one physical planning of the output frame here. That is
      // deliberate bug-compat with the reference's own instrumentation
      // (MaskDataTransform.scala:160 does the same to report partitions);
      // callers who cannot afford the planning pass use apply() directly,
      // which attaches no instrumentation.
      detail += ("numPartitions" -> outputDF.rdd.getNumPartitions)
      if (persist) {
        val start = System.currentTimeMillis()
        outputDF.persist(storageLevel)
        val records = outputDF.count()
        val elapsed = System.currentTimeMillis() - start
        detail += ("records" -> records)
        detail += ("rate" -> (if (records > 0) elapsed / records else 0L))
      }
    }
    (outputDF, detail)
  }

  /** Scale path for low-cardinality masked columns: KDF-hash each DISTINCT
    * value once, then map results back over the full table.
    *
    * At 100 TB a customer-name column might hold billions of cells but only
    * millions of distinct values; hashing per cell wastes (cells/distinct)×
    * the KDF cost. This routes through a distinct-aggregate (map-side combine
    * shrinks the shuffle to the distinct set), computes the KDF once per
    * value, and joins back. The dictionary side is broadcast when it fits
    * (Spark's AQE decides from its actual size); the join key is the original
    * column, so AQE can also convert to shuffled hash join with skew
    * handling when the dictionary is large.
    *
    * Only valid for DETERMINISTIC masking expressions (the expression must be
    * value-functional). `maskExpr` receives the distinct-value column name.
    */
  def maskViaDistinct(
      df: DataFrame,
      column: String,
      maskExpr: String => Column,
      maskedColumn: Option[String] = None): DataFrame = {
    val outName = maskedColumn.getOrElse(column)
    val dictCol = "__graft_distinct_value"
    val maskedDictCol = "__graft_masked_value"
    // The distinct output is BYTES-tiny but each row costs a full KDF call;
    // AQE's size-based coalescing would funnel every hash into one task.
    // An explicit repartition (exempt from coalescing) keeps the KDF stage
    // on all cores — at production Argon2 cost this is the difference
    // between minutes and hours per million distinct values.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val dict = df.select(col(s"`$column`").as(dictCol)).where(col(dictCol).isNotNull).distinct()
      .repartition(parallelism)
      .select(col(dictCol), maskExpr(dictCol).as(maskedDictCol))
    // no broadcast hint: AQE broadcasts the dictionary when it is small and
    // falls back to a shuffled hash join (with skew handling) when the
    // distinct set is large - a forced hint would OOM the driver there
    val joined = df.join(dict, df(s"`$column`") === dict(dictCol), "left")
    val projected: Array[Column] =
      if (outName == column) df.columns.map {
        case `column` => col(maskedDictCol).as(column)
        case c => col(s"`$c`")
      }
      else df.columns.map(c => col(s"`$c`")) :+ col(maskedDictCol).as(outName)
    joined.select(projected.toIndexedSeq: _*)
  }
}
