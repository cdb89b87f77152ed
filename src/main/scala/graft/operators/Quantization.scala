package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.QuantExpressions

/** Symmetric int8 embedding quantization.
  *
  * The scale path for 100 TB similarity corpora: a 64-dim float32 embedding
  * is 256 bytes/row; int8 + one double scale is 72 — a 3.5-4x cut in
  * storage, shuffle, and broadcast cost for every downstream ANN/dedup
  * stage, at a bounded per-element reconstruction error of `scale/2`
  * (half a quantization step). Search pipelines route/shortlist on the
  * quantized vectors and re-rank survivors on the originals — the error
  * bound is what makes the shortlist's recall analyzable.
  *
  * Entirely narrow (no shuffle): three codegen'd Catalyst expressions
  * ([[graft.plans.MaxAbs]], [[graft.plans.QuantizeInt8]],
  * [[graft.plans.DequantMaxError]]) run inside whole-stage codegen over
  * the scan.
  */
object Quantization {

  /** Adds `scale` (double) and `q` (array<int>, values in [-127, 127]) for
    * `vecCol`. Vectors are quantized independently — per-vector scale, no
    * global calibration pass, so the operator composes with any partitioning. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val withScale = df.withColumn("scale", QuantExpressions.maxAbs(col(vecCol)) / lit(127.0))
    withScale.withColumn("q", QuantExpressions.quantizeInt8(col(vecCol), col("scale")))
  }

  /** `quantizeInt8` plus `max_err` (double): the per-vector max absolute
    * reconstruction error, `<= scale/2` by construction. */
  def quantizeWithError(df: DataFrame, vecCol: String): DataFrame =
    quantizeInt8(df, vecCol).withColumn("max_err",
      QuantExpressions.dequantMaxError(col(vecCol), col("q"), col("scale")))
}
