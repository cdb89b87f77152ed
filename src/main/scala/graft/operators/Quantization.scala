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

  /** Deterministic ±1 sign random projection (Achlioptas 2003's database-
    * friendly Johnson–Lindenstrauss variant): `y_j = Σ_i q_i · s(i,j)`
    * with `q_i = round(x_i · scale)` and `s(i,j) = ±1` from the portable
    * multiplicative hash — dimensionality reduction that preserves
    * pairwise distances within JL bounds while shrinking every downstream
    * similarity shuffle by dim/outDim. EXACT and engine-portable: the
    * sign matrix is a pure integer function of (i, j) (`((i·2654435761 +
    * j·40503) div 65536) mod 2` — a MIDDLE hash bit; the low bit of a
    * product with an odd constant is just parity(i), which would make a
    * degenerate checkerboard), and each `y_j` is an integer-valued sum of
    * |q_i| ≤ ~1e7 terms — exact in the double accumulator (≪ 2^53)
    * regardless of order, so the projection is bit-identical across
    * engines and replayed by SQL.
    *
    * The 1/√outDim normalization is deliberately OMITTED: it is a global
    * constant that cancels in every ranking/threshold use, and dividing
    * would leave the exact-integer grid. Vectors shorter than `dim`,
    * NULL, or with NULL elements are dropped (no well-defined
    * projection).
    *
    * Scale shape: the sign matrix is a dim × outDim plan literal
    * (model-sized), each output coordinate one codegen'd dot kernel call
    * — a pure in-row projection, zero shuffle at any corpus size. */
  def signProject(df: DataFrame, idCol: String, embCol: String,
                  dim: Int, outDim: Int, scale: Long = 1000000L): DataFrame = {
    require(dim >= 1 && outDim >= 1 && outDim <= 256, "need 1 <= outDim <= 256 and dim >= 1")
    require(scale > 0, "grid scale must be positive")
    val emb = col(s"`$embCol`").cast("array<double>")
    val base = df.where(emb.isNotNull && size(emb) >= dim && !exists(emb, _.isNull))
      .select(col(s"`$idCol`").cast("long").as("vid"),
        transform(slice(emb, 1, dim), x => round(x * scale, 0)).as("__q"))
    val proj = array((0 until outDim).map { j =>
      val signs = typedlit((0 until dim).map { i =>
        if (((i.toLong * 2654435761L + j.toLong * 40503L) / 65536L) % 2L == 0L) 1.0 else -1.0
      }.toList)
      graft.plans.VectorExpressions.dot(col("__q"), signs).cast("long")
    }: _*)
    base.select(col("vid"), proj.as("proj"))
  }
}
