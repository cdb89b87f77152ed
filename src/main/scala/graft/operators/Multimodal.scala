package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payload columns + typed metadata, with
  * decode / feature-extraction / resize / frame-sampling as per-partition
  * batch transforms.
  *
  * Image DIMENSIONS are parsed for real from the public container formats
  * (PNG IHDR, JPEG SOFn, GIF logical-screen descriptor, BMP info header) —
  * pure byte-level parsing of published specs, no codec library needed.
  * Full pixel decode / the embedding FEATURE vector remain a declared STUB
  * (deterministic content-hash features), since the media codecs are not
  * available in this environment; a real embedder drops in by replacing
  * [[stubFeatures]] alone.
  */
object Multimodal {

  /** Canonical media schema: (media_id, modality, format, content). */
  case class MediaRecord(media_id: Long, modality: String, format: String, content: Array[Byte])

  case class MediaFeatures(media_id: Long, modality: String, format_detected: String,
                           width: Int, height: Int, n_bytes: Int, features: Array[Float])

  /** Parse (format, width, height) from real image container headers.
    * Supported: PNG (8-byte signature + IHDR big-endian dims), JPEG
    * (marker scan to the first SOFn frame header), GIF87a/GIF89a
    * (little-endian logical screen size), BMP (BITMAPINFOHEADER
    * little-endian, height may be negative = top-down). Returns None for
    * anything unrecognized or truncated. */
  def parseDimensions(content: Array[Byte]): Option[(String, Int, Int)] = {
    if (content == null) return None
    @inline def u8(i: Int): Int = content(i) & 0xff
    def beU32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def beU16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leI32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (content.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
      u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
      // bytes 8-11 are the IHDR chunk length (always 13); dims follow the tag
      Some(("png", beU32(16), beU32(20)))
    } else if (content.length >= 10 &&
      u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
      (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      Some(("gif", leU16(6), leU16(8)))
    } else if (content.length >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      Some(("bmp", leI32(18), math.abs(leI32(22))))
    } else if (content.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk FF xx segments until a frame header (SOF0..15 minus the
      // non-frame C4/C8/CC); its payload is precision(1) height(2) width(2)
      var i = 2
      while (i + 3 < content.length) {
        if (u8(i) != 0xff) return None // desynced/corrupt stream
        var j = i + 1
        while (j < content.length && u8(j) == 0xff) j += 1 // fill bytes
        if (j >= content.length) return None
        val marker = u8(j)
        if (marker >= 0xd0 && marker <= 0xd9 || marker == 0x01) {
          i = j + 1 // standalone marker, no length field
        } else {
          if (j + 2 >= content.length) return None
          val len = beU16(j + 1)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            return if (j + 7 < content.length) Some(("jpeg", beU16(j + 6), beU16(j + 4))) else None
          }
          i = j + 1 + len
        }
      }
      None
    } else None
  }

  /** STUB feature kernel (declared): a real implementation would decode the
    * pixels/samples and run an embedding model; this derives a deterministic
    * 8-dim vector from a content hash so the plumbing is exercised
    * end-to-end with stable, assertable outputs. */
  private[operators] def stubFeatures(content: Array[Byte]): Array[Float] = {
    if (content == null || content.isEmpty) return Array.fill(8)(0f)
    var h = 1125899906842597L
    content.foreach(b => h = 31 * h + b)
    Array.tabulate(8)(i => math.floorMod(h >>> (i * 7), 1000).toFloat / 1000f)
  }

  /** Decode kernel: REAL header-parsed dimensions where a known container
    * format is present, zero dims + "unknown" otherwise; stub features. */
  private[operators] def decode(content: Array[Byte]): (String, Int, Int, Array[Float]) = {
    if (content == null || content.isEmpty) return ("unknown", 0, 0, Array.fill(8)(0f))
    val (fmt, w, h) = parseDimensions(content).getOrElse(("unknown", 0, 0))
    (fmt, w, h, stubFeatures(content))
  }

  /** Minimal well-formed PNG prefix (8-byte signature + IHDR chunk) with the
    * given dimensions — used by tests and the synthetic-media query; the rest
    * of a real file (IDAT/IEND) is irrelevant to the header parse. */
  def pngHeaderBytes(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(width).putInt(height)
    // bit depth 8, truecolor, deflate, no filter, no interlace + CRC
    b.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0) // CRC not validated by the header parse
    b.array()
  }

  /** Batch feature extraction: one kernel "initialization" per partition
    * (mirrors how a real decoder amortizes model/codec setup), rows streamed
    * through it. Narrow transform — preserves partitioning, no shuffle. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = Decoder.open(...) — once per partition
      rows.map { r =>
        val (fmt, w, h, feats) = decode(r.content)
        MediaFeatures(r.media_id, r.modality, fmt, w, h,
          if (r.content == null) 0 else r.content.length, feats)
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
