package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payload columns + typed metadata, with
  * decode / feature-extraction / resize / frame-sampling as per-partition
  * batch transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are STUBBED with a deterministic fake (clearly marked
  * below): it derives pseudo-dimensions and a feature vector from a content
  * hash. Everything around the kernel — the schema contract, binary-safe
  * shuffling, per-partition batching (one kernel init per partition, not
  * per row), and the feature-column plumbing — is real and tested, so a
  * real decoder drops in by replacing [[fakeDecode]] alone.
  */
object Multimodal {

  /** Canonical media schema: (media_id, modality, format, content). */
  case class MediaRecord(media_id: Long, modality: String, format: String, content: Array[Byte])

  case class MediaFeatures(media_id: Long, modality: String, width: Int, height: Int,
                           n_bytes: Int, features: Array[Float])

  /** STUB decode kernel. A real implementation would decode `content` with
    * an image/audio library; this derives deterministic pseudo-metadata and
    * an 8-dim feature vector from the payload bytes so the plumbing is
    * exercised end-to-end with stable, assertable outputs. */
  private[operators] def fakeDecode(content: Array[Byte]): (Int, Int, Array[Float]) = {
    if (content == null || content.isEmpty) return (0, 0, Array.fill(8)(0f))
    var h = 1125899906842597L
    content.foreach(b => h = 31 * h + b)
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >>> 10, 1024).toInt
    val feats = Array.tabulate(8)(i => math.floorMod(h >>> (i * 7), 1000).toFloat / 1000f)
    (width, height, feats)
  }

  /** Batch feature extraction: one kernel "initialization" per partition
    * (mirrors how a real decoder amortizes model/codec setup), rows streamed
    * through it. Narrow transform — preserves partitioning, no shuffle. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = Decoder.open(...) — once per partition
      rows.map { r =>
        val (w, h, feats) = fakeDecode(r.content)
        MediaFeatures(r.media_id, r.modality, w, h, if (r.content == null) 0 else r.content.length, feats)
      }
    }
  }

  /** DataFrame-level entry: requires (media_id, modality, format, content). */
  def extractFeaturesDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    extractFeatures(df.select(
      col("media_id").cast("long"), col("modality").cast("string"),
      col("format").cast("string"), col("content").cast("binary")).as[MediaRecord]).toDF()
  }

  /** Frame sampling stub for video payloads: emits every nth "frame" as a
    * (media_id, frame_index, frame_bytes) row. The frame splitter is fake
    * (fixed-size byte windows); the explode/plumbing shape is real. */
  def sampleFrames(df: DataFrame, everyNth: Int, frameBytes: Int = 256): DataFrame = {
    require(everyNth >= 1)
    val slicer = udf((content: Array[Byte]) =>
      if (content == null) Seq.empty[(Int, Array[Byte])]
      else content.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyNth == 0 => (idx, frame)
      }.toSeq)
    df.select(col("media_id"), explode(slicer(col("content"))).as("f"))
      .select(col("media_id"), col("f._1").as("frame_index"), col("f._2").as("frame"))
  }

  /** Embedding-style aggregate over extracted features: mean feature vector
    * per modality (shows the features column flowing into a typed agg). */
  def meanFeaturesByModality(features: DataFrame): DataFrame = {
    val dim = 8
    features.groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        array((0 until dim).map(i => avg(col("features").getItem(i))): _*).as("mean_features"))
  }
}
