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
  *
  * PNG pixels are decoded FOR REAL: IDAT inflation via `java.util.zip
  * .Inflater`, scanline unfiltering (all five PNG filter types), color
  * types 0/2/3/4/6 at bit depth 8 — the feature vector for a PNG is the
  * per-RGBA-channel pixel mean and standard deviation. Formats whose
  * decode needs an actual codec library (JPEG entropy decode, GIF LZW)
  * fall back to the declared [[stubFeatures]] content-hash kernel; a real
  * embedder drops in by replacing the feature kernel alone.
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
      // dims at 18/22 exist only for the BITMAPINFOHEADER family (header
      // size 40/108/124 at offset 14); an OS/2 BITMAPCOREHEADER (size 12,
      // 16-bit dims) would fuse its fields into a bogus width — reject
      // unknown header sizes and non-positive widths instead
      val hdr = leI32(14)
      val w = leI32(18)
      if ((hdr == 40 || hdr == 108 || hdr == 124) && w > 0)
        Some(("bmp", w, math.abs(leI32(22))))
      else None
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

  /** STUB feature kernel (declared): for formats needing a real codec
    * library (JPEG/GIF/BMP payloads and unknown blobs) this derives a
    * deterministic 8-dim vector from a content hash so the plumbing is
    * exercised end-to-end with stable, assertable outputs. PNG does NOT go
    * through this — see [[pngPixelFeatures]]. */
  private[operators] def stubFeatures(content: Array[Byte]): Array[Float] = {
    if (content == null || content.isEmpty) return Array.fill(8)(0f)
    var h = 1125899906842597L
    content.foreach(b => h = 31 * h + b)
    Array.tabulate(8)(i => math.floorMod(h >>> (i * 7), 1000).toFloat / 1000f)
  }

  // --- real PNG pixel decode ----------------------------------------------

  /** Decoded raster: `samples` is row-major with `channels` interleaved
    * 8-bit samples per pixel (palette already expanded to RGB). */
  private[operators] final case class Raster(width: Int, height: Int, channels: Int,
                                             colorType: Int, samples: Array[Byte])

  /** Full PNG pixel decode using only public JVM APIs: chunk walk (IHDR /
    * PLTE / IDAT / IEND), zlib inflation of the concatenated IDAT stream,
    * and per-scanline unfiltering of the five PNG filters (None/Sub/Up/
    * Average/Paeth, spec §9). Supports bit depth 8, color types 0 (gray),
    * 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    * Returns None (caller falls back to the stub) for other profiles or
    * malformed streams. */
  private[operators] def pngDecode(content: Array[Byte]): Option[Raster] = {
    if (content == null || content.length < 45) return None
    @inline def u8(i: Int): Int = content(i) & 0xff
    def beU32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (!(0 until 8).forall(i => u8(i) == sig(i))) return None

    var width, height, bitDepth, colorType, interlace = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 8 <= content.length) {
      val len = beU32(i)
      // LONG bounds arithmetic: a crafted/corrupt len near Int.MaxValue
      // overflows `i + 12 + len` in Int, bypasses the guard, and the
      // chunk copy throws an uncaught IndexOutOfBoundsException — the
      // WAV/AVI walkers already do this in Long; PNG was the Int one out
      if (len < 0 || i.toLong + 12L + len > content.length) return None
      val tag = new String(content, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          width = beU32(i + 8); height = beU32(i + 12)
          bitDepth = u8(i + 16); colorType = u8(i + 17)
          interlace = u8(i + 20)
        case "PLTE" => palette = java.util.Arrays.copyOfRange(content, i + 8, i + 8 + len)
        case "IDAT" => idat.write(content, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk - skip
      }
      i += 12 + len
    }
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => return None
    }
    if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0) return None
    if (colorType == 3 && palette == null) return None
    // 1 filter byte + width*channels samples per scanline; widths up to
    // 2^31-1 pass the sign check, so size the buffers in Long before
    // allocating (an Int overflow here would turn a crafted header into an
    // uncaught NegativeArraySizeException instead of the stub fallback)
    val strideL = width.toLong * channels
    val expected = (strideL + 1) * height
    if (expected > Int.MaxValue || strideL * height > Int.MaxValue ||
      width.toLong * height * 3 > Int.MaxValue) return None
    val stride = strideL.toInt

    val raw = new Array[Byte](expected.toInt)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // n==0 without finishing means truncation OR a preset-dictionary
        // (FDICT) stream we can't service — either way, bail to the stub
        if (n == 0) return None
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()

    // unfilter in place into `out` (spec §9: predictors operate bytewise at
    // the pixel stride `bpp`)
    val bpp = channels // bit depth 8
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val f = raw(rowIn + x) & 0xff
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            f + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }

    if (colorType == 3) {
      // expand palette indices to RGB
      val rgb = new Array[Byte](width * height * 3)
      var p = 0
      while (p < width * height) {
        val idx = (out(p) & 0xff) * 3
        if (idx + 2 >= palette.length) return None
        rgb(p * 3) = palette(idx); rgb(p * 3 + 1) = palette(idx + 1); rgb(p * 3 + 2) = palette(idx + 2)
        p += 1
      }
      Some(Raster(width, height, 3, 2, rgb))
    } else Some(Raster(width, height, channels, colorType, out))
  }

  /** Real PNG features: per-RGBA-channel pixel mean and standard deviation,
    * each scaled to [0,1] — `[mR, mG, mB, mA, sR, sG, sB, sA]`. Gray
    * expands to R=G=B; missing alpha is opaque 255. */
  private[operators] def pngPixelFeatures(content: Array[Byte]): Option[Array[Float]] =
    pngDecode(content).map { r =>
      val n = r.width.toLong * r.height
      val sum = new Array[Double](4)
      val sumSq = new Array[Double](4)
      val px = new Array[Int](4)
      var p = 0
      while (p < n) {
        val base = p * r.channels
        r.colorType match {
          case 0 =>
            val v = r.samples(base) & 0xff
            px(0) = v; px(1) = v; px(2) = v; px(3) = 255
          case 2 =>
            px(0) = r.samples(base) & 0xff; px(1) = r.samples(base + 1) & 0xff
            px(2) = r.samples(base + 2) & 0xff; px(3) = 255
          case 4 =>
            val v = r.samples(base) & 0xff
            px(0) = v; px(1) = v; px(2) = v; px(3) = r.samples(base + 1) & 0xff
          case _ =>
            px(0) = r.samples(base) & 0xff; px(1) = r.samples(base + 1) & 0xff
            px(2) = r.samples(base + 2) & 0xff; px(3) = r.samples(base + 3) & 0xff
        }
        var ch = 0
        while (ch < 4) {
          sum(ch) += px(ch); sumSq(ch) += px(ch).toDouble * px(ch); ch += 1
        }
        p += 1
      }
      Array.tabulate(8) { i =>
        if (i < 4) (sum(i) / n / 255.0).toFloat
        else {
          val ch = i - 4
          val mean = sum(ch) / n
          (math.sqrt(math.max(0.0, sumSq(ch) / n - mean * mean)) / 255.0).toFloat
        }
      }
    }

  // --- real WAV (RIFF/PCM) audio decode -----------------------------------

  /** Decoded PCM audio: interleaved 16-bit samples. */
  private[operators] final case class PcmAudio(sampleRate: Int, channels: Int,
                                               bitsPerSample: Int, samples: Array[Short])

  case class AudioFeatures(media_id: Long, format_detected: String, sample_rate: Int,
                           channels: Int, bits_per_sample: Int, n_frames: Long,
                           duration_ms: Long, features: Array[Float])

  /** Real WAV decode from the public RIFF spec: 'RIFF'+'WAVE' container
    * walk, 'fmt ' chunk (PCM format 1, 16-bit only), 'data' chunk as
    * little-endian interleaved samples. Unknown chunks are skipped like any
    * compliant reader. Returns None for compressed/float/other-depth
    * profiles or malformed containers — callers fall back to the stub. */
  private[operators] def wavDecode(content: Array[Byte]): Option[PcmAudio] = {
    if (content == null || content.length < 44) return None
    @inline def u8(i: Int): Int = content(i) & 0xff
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leU32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String = new String(content, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None

    var sampleRate, channels, bits, audioFormat = -1
    var dataOff, dataLen = -1L
    var i = 12L
    while (i + 8 <= content.length) {
      val chunkTag = tag(i.toInt)
      val len = leU32(i.toInt + 4)
      val body = i + 8
      if (body + len > content.length) return None // truncated chunk
      chunkTag match {
        case "fmt " =>
          if (len < 16) return None
          audioFormat = leU16(body.toInt)
          channels = leU16(body.toInt + 2)
          sampleRate = leU32(body.toInt + 4).toInt
          bits = leU16(body.toInt + 14)
        case "data" => dataOff = body; dataLen = len
        case _ => // ancillary (LIST, fact, cue, ...) - skip
      }
      i = body + len + (len & 1) // chunks are word-aligned (pad byte)
    }
    if (audioFormat != 1 || bits != 16 || channels < 1 || channels > 8 ||
      sampleRate <= 0 || dataOff < 0) return None
    val n = (dataLen / 2).toInt
    if (n.toLong * 2 != dataLen - (dataLen & 1)) return None
    val samples = new Array[Short](n)
    var s = 0
    while (s < n) {
      samples(s) = (u8(dataOff.toInt + s * 2) | (u8(dataOff.toInt + s * 2 + 1) << 8)).toShort
      s += 1
    }
    Some(PcmAudio(sampleRate, channels, bits, samples))
  }

  /** Real WAV encoder (exact inverse of [[wavDecode]]): RIFF/WAVE header,
    * canonical 16-byte PCM 'fmt ' chunk, little-endian 'data' chunk. */
  def wavEncode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Real audio features from decoded PCM: per-channel mean and RMS for the
    * first two channels, then global min/max and peak/crest statistics —
    * `[meanC0, meanC1, rmsC0, rmsC1, min, max, peak, zeroCrossRate]`, all
    * normalized to [-1,1] by 1/32768 (rate in [0,1]). Mono mirrors C0 into
    * C1. */
  /** Real linear-interpolation PCM resample: decode -> per-channel lerp at
    * source position `j * inRate / outRate` (round-half-up back to int16)
    * -> re-encode. `outFrames = floor(inFrames * outRate / inRate)`. A
    * constant (DC) signal passes through bit-exactly — the oracle-checkable
    * invariant — and a linear ramp reproduces its midpoints exactly at 2x. */
  def wavResample(content: Array[Byte], outRate: Int): Option[Array[Byte]] = {
    require(outRate > 0, "outRate must be positive")
    // an upsample whose output exceeds array addressability must decline
    // (resampled=false downstream), not wrap negative and throw
    // NegativeArraySizeException inside the task
    wavDecode(content).filter { a =>
      val inFrames = a.samples.length / a.channels
      val outFramesL = if (inFrames == 0) 0L else inFrames.toLong * outRate / a.sampleRate
      outFramesL * a.channels <= Int.MaxValue.toLong
    }.map { a =>
      val inFrames = a.samples.length / a.channels
      val outFrames = if (inFrames == 0) 0 else (inFrames.toLong * outRate / a.sampleRate).toInt
      val out = new Array[Short](outFrames * a.channels)
      var j = 0
      while (j < outFrames) {
        val pos = j.toDouble * a.sampleRate / outRate
        val i0 = pos.toInt
        val i1 = math.min(i0 + 1, inFrames - 1)
        val frac = pos - i0
        var c = 0
        while (c < a.channels) {
          val v = a.samples(i0 * a.channels + c) * (1.0 - frac) +
            a.samples(i1 * a.channels + c) * frac
          out(j * a.channels + c) = math.floor(v + 0.5).toShort
          c += 1
        }
        j += 1
      }
      wavEncode(outRate, a.channels, out)
    }
  }

  private[operators] def wavFeatures(a: PcmAudio): Array[Float] = {
    val frames = a.samples.length / a.channels
    if (frames == 0) return Array.fill(8)(0f)
    val sum = new Array[Double](2)
    val sumSq = new Array[Double](2)
    var min = Int.MaxValue; var max = Int.MinValue; var peak = 0
    var zeroCross = 0L; var prev0 = 0
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < a.channels) {
        val v = a.samples(f * a.channels + c).toInt
        if (c < 2) { sum(c) += v; sumSq(c) += v.toDouble * v }
        if (v < min) min = v
        if (v > max) max = v
        val mag = math.abs(v); if (mag > peak) peak = mag
        c += 1
      }
      val v0 = a.samples(f * a.channels).toInt
      if (f > 0 && ((v0 >= 0) != (prev0 >= 0))) zeroCross += 1
      prev0 = v0
      f += 1
    }
    val c1 = if (a.channels > 1) 1 else 0
    Array(
      (sum(0) / frames / 32768.0).toFloat,
      (sum(c1) / frames / 32768.0).toFloat,
      (math.sqrt(sumSq(0) / frames) / 32768.0).toFloat,
      (math.sqrt(sumSq(c1) / frames) / 32768.0).toFloat,
      (min / 32768.0).toFloat,
      (max / 32768.0).toFloat,
      (peak / 32768.0).toFloat,
      (if (frames > 1) zeroCross.toDouble / (frames - 1) else 0.0).toFloat)
  }

  /** Batch audio feature extraction over (media_id, content) — the audio
    * analog of [[extractFeatures]]: narrow mapPartitions, real WAV decode,
    * stub-shaped zero row (format "unknown") when decode declines. */
  def extractAudioFeaturesDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          wavDecode(content) match {
            case Some(a) =>
              val frames = a.samples.length / a.channels
              AudioFeatures(id, "wav", a.sampleRate, a.channels, a.bitsPerSample,
                frames, frames * 1000L / a.sampleRate, wavFeatures(a))
            case None =>
              AudioFeatures(id, "unknown", 0, 0, 0, 0L, 0L,
                stubFeatures(content))
          }
        }
      }.toDF()
  }

  /** Decode kernel: REAL header-parsed dimensions where a known container
    * format is present, zero dims + "unknown" otherwise. PNG features are
    * real pixel statistics ([[pngPixelFeatures]]); everything else takes
    * the declared stub kernel. */
  private[operators] def decode(content: Array[Byte]): (String, Int, Int, Array[Float]) = {
    if (content == null || content.isEmpty) return ("unknown", 0, 0, Array.fill(8)(0f))
    val (fmt, w, h) = parseDimensions(content).getOrElse(("unknown", 0, 0))
    val feats =
      if (fmt == "png") pngPixelFeatures(content).getOrElse(stubFeatures(content))
      else stubFeatures(content)
    (fmt, w, h, feats)
  }

  /** Full PNG encoder (the exact inverse of [[pngDecode]]): signature, IHDR,
    * optional PLTE, one IDAT with the zlib-deflated filtered scanlines, IEND
    * — all with real CRC32s, so the output is a spec-valid PNG any decoder
    * accepts. `samples` is row-major interleaved (width*height*channels
    * bytes; palette indices for color type 3). `filterType` 0-4 filters
    * every scanline with that PNG filter; -1 cycles filters per row
    * (y % 5) to exercise all five predictors in one image. */
  def pngEncode(width: Int, height: Int, colorType: Int, samples: Array[Byte],
                palette: Array[Byte] = null, filterType: Int = 0): Array[Byte] = {
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case other => throw new IllegalArgumentException(s"unsupported color type $other")
    }
    val stride = width * channels
    require(samples.length == stride * height, s"need $stride*$height samples, got ${samples.length}")
    require(colorType != 3 || palette != null, "palette required for color type 3")

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    def writeChunk(tag: String, payload: Array[Byte]): Unit = {
      val len = payload.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte), 0, 4)
      val tagBytes = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tagBytes, 0, 4)
      out.write(payload, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tagBytes); crc.update(payload)
      val c = crc.getValue.toInt
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk("IHDR", ihdr.array())
    if (colorType == 3) writeChunk("PLTE", palette)

    // filter each scanline (spec §9: filt(x) = raw(x) - predictor, bytewise
    // at pixel stride bpp) then deflate the whole filtered stream
    val bpp = channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = if (filterType == -1) y % 5 else filterType
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = samples(y * stride + x) & 0xff
        val a = if (x >= bpp) samples(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) samples((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) samples((y - 1) * stride + x - bpp) & 0xff else 0
        val filt = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + x) = (filt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    writeChunk("IDAT", idat.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
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

  /** REAL image resize (nearest-neighbor) for PNG payloads: decode →
    * resample → re-encode (palette images come back truecolor since decode
    * expands them). Returns None for undecodable payloads — callers keep
    * the original bytes. Nearest-neighbor is the deterministic, exactly
    * specifiable kernel (sample source pixel `floor(i * src / dst)`); a
    * production embedder swaps in its own filter without touching the
    * plumbing. */
  def resizePng(content: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    if (outW <= 0 || outH <= 0) return None
    pngDecode(content).map { r =>
      val out = new Array[Byte](outW * outH * r.channels)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * r.height / outH).toInt
        var x = 0
        while (x < outW) {
          val sx = (x.toLong * r.width / outW).toInt
          var c = 0
          while (c < r.channels) {
            out((y * outW + x) * r.channels + c) = r.samples((sy * r.width + sx) * r.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      pngEncode(outW, outH, r.colorType, out)
    }
  }

  /** Batch resize over (media_id, content): decoded PNGs are resized and
    * re-encoded; undecodable payloads pass through unchanged with
    * `resized=false`. Narrow mapPartitions — no shuffle. */
  def resizeImagesDF(df: DataFrame, outW: Int, outH: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          resizePng(content, outW, outH) match {
            case Some(resized) => (id, resized, true)
            case None => (id, content, false)
          }
        }
      }.toDF("media_id", "content", "resized")
  }

  /** Batch audio resample over (media_id, content): narrow mapPartitions,
    * real decode -> lerp -> re-encode ([[wavResample]]); undecodable rows
    * pass through with `resampled=false`. */
  def resampleAudioDF(df: DataFrame, outRate: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          wavResample(content, outRate) match {
            case Some(resampled) => (id, resampled, true)
            case None => (id, content, false)
          }
        }
      }.toDF("media_id", "content", "resampled")
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

  // --- perceptual image hash ---------------------------------------------

  /** 64-bit difference hash (dHash — the standard cheap perceptual image
    * fingerprint: Krawetz's "kind of like that" construction) of a decoded
    * PNG: integer luma, 9×8 block-average downsample, one bit per
    * horizontal neighbor comparison. Every step is integer arithmetic —
    * floor-division luma (299·R + 587·G + 114·B)/1000, floor-division
    * block means — so the hash is exactly replayable from the pixel
    * values by any engine (the oracle recomputes it in SQL from the
    * planted pixel formula; no float anywhere).
    *
    * Bit layout: bit (gy·8 + gx) = 1 iff cell(gy, gx+1) > cell(gy, gx),
    * gy in 0..7, gx in 0..7 over a 9-column × 8-row cell grid. Invariant
    * to uniform brightness shifts (comparisons are order-based), which is
    * what makes it a NEAR-dup key rather than a byte hash.
    *
    * Block (ci, ri) covers pixel cols [ci·W/9, (ci+1)·W/9) and rows
    * [ri·H/8, (ri+1)·H/8) (integer division), widened to at least one
    * pixel (clamped) when W < 9 or H < 8. Returns None for undecodable
    * content. */
  def pngDHash64(content: Array[Byte]): Option[Long] =
    pngDecode(content).map { r =>
      val ch = r.channels
      dhashFromLuma(r.width, r.height, { p =>
        val base = p * ch
        r.colorType match {
          case 0 | 4 => r.samples(base) & 0xff
          case _ =>
            (299 * (r.samples(base) & 0xff) + 587 * (r.samples(base + 1) & 0xff) +
              114 * (r.samples(base + 2) & 0xff)) / 1000
        }
      })
    }

  /** The dHash cell construction over ANY luma accessor (shared with the
    * JPEG path, [[Jpeg.jpegDHash64]], so both codecs land in one
    * signature space): 9×8 grid of integer block-mean lumas, bit
    * (gy·8+gx) = 1 iff the right neighbor cell is brighter. */
  private[operators] def dhashFromLuma(w: Int, h: Int, luma: Int => Int): Long = {
    // 9x8 cell grid of block-mean lumas (integer floor division)
    val cells = Array.ofDim[Int](8, 9)
    var ri = 0
    while (ri < 8) {
      var ci = 0
      while (ci < 9) {
        val x0 = math.min(ci * w / 9, w - 1)
        val x1 = math.max((ci + 1) * w / 9, x0 + 1)
        val y0 = math.min(ri * h / 8, h - 1)
        val y1 = math.max((ri + 1) * h / 8, y0 + 1)
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luma(y * w + x); n += 1; x += 1 }
          y += 1
        }
        cells(ri)(ci) = (s / n).toInt
        ci += 1
      }
      ri += 1
    }
    var hash = 0L
    ri = 0
    while (ri < 8) {
      var gx = 0
      while (gx < 8) {
        if (cells(ri)(gx + 1) > cells(ri)(gx)) hash |= 1L << (ri * 8 + gx)
        gx += 1
      }
      ri += 1
    }
    hash
  }

  /** Batch dHash over (media_id, content): narrow mapPartitions (binary
    * decode has no Catalyst fit), no shuffle; undecodable rows emit a
    * null hash. Output: (media_id, dhash, decoded). */
  /** Format-agnostic image dHash: magic-byte dispatch to the PNG or
    * baseline-JPEG decoder (a real media column holds both; lossy and
    * lossless copies of one picture land in one signature space by the
    * shared [[dhashFromLuma]] construction). Unknown/undecodable content
    * → None. */
  def imageDHash64(content: Array[Byte]): Option[Long] = {
    if (content == null || content.length < 3) return None
    if ((content(0) & 0xff) == 0x89 && content(1) == 'P'.toByte) pngDHash64(content)
    else if ((content(0) & 0xff) == 0xff && (content(1) & 0xff) == 0xd8)
      Jpeg.jpegDHash64(content)
    else None
  }

  def dhashImagesDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          imageDHash64(content) match {
            case Some(hd) => (id, Some(hd), true)
            case None => (id, None, false)
          }
        }
      }.toDF("media_id", "dhash", "decoded")
  }

  /** 64-bit audio envelope hash — the dHash construction on the time
    * axis (the cheap deterministic cousin of spectral fingerprints like
    * Shazam's: Wang 2003 motivates landmark/relative features; here the
    * relative feature is the energy DELTA between adjacent windows):
    * decode WAV, mix to mono by integer-floor channel average, split the
    * frame sequence into 65 equal windows, window energy = Σ|sample|
    * (exact long), bit i = energy(i+1) > energy(i). Integer end to end —
    * replayable by the oracle from a planted sample formula — and
    * invariant to uniform amplitude scaling (comparisons are
    * order-based), so re-gained copies of the same clip collide, which
    * is the near-dup semantics. Windows are clamped non-empty below 65
    * frames. Returns None for undecodable content or zero frames. */
  def wavEnvelopeHash64(content: Array[Byte]): Option[Long] =
    wavDecode(content).flatMap { a =>
      val frames = a.samples.length / a.channels
      if (frames == 0) None
      else Some(envelope64(Array.tabulate(frames) { f =>
        var mono = 0L
        var c = 0
        while (c < a.channels) { mono += a.samples(f * a.channels + c); c += 1 }
        // floorDiv: the mono mix of negative sums must floor the same
        // way in every engine (Scala / rounds toward zero)
        math.abs(Math.floorDiv(mono, a.channels))
      }))
    }

  /** The shared envelope-bit construction: 65 clamped equal windows over
    * an integer series, window energy = exact long sum, bit i =
    * energy(i+1) > energy(i). */
  private def envelope64(series: Array[Long]): Long = {
    val n = series.length
    val energy = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val i0 = math.min(w.toLong * n / 65, n - 1L).toInt
      val i1 = math.max(((w + 1).toLong * n / 65).toInt, i0 + 1)
      var s = 0L
      var i = i0
      while (i < i1) { s += series(i); i += 1 }
      energy(w) = s
      w += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (energy(i + 1) > energy(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** 64-bit video clip fingerprint: [[envelope64]] over the PER-FRAME
    * byte-mass series of a decoded AVI (frame energy = Σ unsigned bytes
    * of the raw '00db' payload) — the temporal-structure twin of the
    * audio envelope hash: clips with the same motion profile collide,
    * and a uniform brightness offset over equal-size frames shifts every
    * window by the same constant, leaving all comparison bits unchanged.
    * Returns None for undecodable content or zero frames. */
  def aviEnvelopeHash64(content: Array[Byte]): Option[Long] =
    aviFrames(content).flatMap { frames =>
      if (frames.isEmpty) None
      else Some(envelope64(frames.map { f =>
        var s = 0L
        var i = 0
        while (i < f.length) { s += (f(i) & 0xff); i += 1 }
        s
      }.toArray))
    }

  /** Batch clip fingerprint over (media_id, content): narrow
    * mapPartitions, no shuffle; undecodable rows emit a null hash. */
  def envelopeHashVideoDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          aviEnvelopeHash64(content) match {
            case Some(hd) => (id, Some(hd), true)
            case None => (id, None, false)
          }
        }
      }.toDF("media_id", "vhash", "decoded")
  }

  /** Batch envelope hash over (media_id, content): narrow mapPartitions,
    * no shuffle; undecodable rows emit a null hash. */
  def envelopeHashAudioDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, content) =>
          wavEnvelopeHash64(content) match {
            case Some(hd) => (id, Some(hd), true)
            case None => (id, None, false)
          }
        }
      }.toDF("media_id", "ehash", "decoded")
  }

  // --- real AVI (RIFF) video container -----------------------------------

  case class AviMeta(width: Int, height: Int, totalFrames: Int, usPerFrame: Int)

  /** Real AVI container parse from the public RIFF spec: 'RIFF'+'AVI '
    * signature, 'hdrl' LIST with the 56-byte 'avih' main header (frame
    * period, frame count, dimensions). Returns None for anything else. */
  def aviParse(content: Array[Byte]): Option[AviMeta] = {
    if (content == null || content.length < 12) return None
    @inline def u8(i: Int): Int = content(i) & 0xff
    def leU32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String = new String(content, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var i = 12L
    while (i + 8 <= content.length) {
      val len = leU32(i.toInt + 4)
      if (i + 8 + len > content.length) return None
      if (tag(i.toInt) == "LIST" && len >= 4 && tag(i.toInt + 8) == "hdrl") {
        // walk the list body for the avih chunk
        var j = i + 12
        val end = i + 8 + len
        while (j + 8 <= end) {
          val clen = leU32(j.toInt + 4)
          if (j + 8 + clen > end) return None
          if (tag(j.toInt) == "avih" && clen >= 40) {
            val b = j.toInt + 8
            return Some(AviMeta(
              width = leU32(b + 32).toInt, height = leU32(b + 36).toInt,
              totalFrames = leU32(b + 16).toInt, usPerFrame = leU32(b).toInt))
          }
          j += 8 + clen + (clen & 1)
        }
        return None // hdrl without avih is malformed
      }
      i += 8 + len + (len & 1)
    }
    None
  }

  /** Real frame extraction: the payloads of every '..db'/'..dc' chunk in
    * the 'movi' LIST, in stream order. None if the container is not AVI or
    * has no movi list. */
  def aviFrames(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    if (aviParse(content).isEmpty) return None
    @inline def u8(i: Int): Int = content(i) & 0xff
    def leU32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String = new String(content, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var i = 12L
    while (i + 8 <= content.length) {
      val len = leU32(i.toInt + 4)
      if (i + 8 + len > content.length) return None
      if (tag(i.toInt) == "LIST" && len >= 4 && tag(i.toInt + 8) == "movi") {
        val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var j = i + 12
        val end = i + 8 + len
        while (j + 8 <= end) {
          val clen = leU32(j.toInt + 4)
          if (j + 8 + clen > end) return None
          val t = tag(j.toInt)
          if (t.length == 4 && (t.endsWith("db") || t.endsWith("dc")))
            frames += java.util.Arrays.copyOfRange(content, j.toInt + 8, (j + 8 + clen).toInt)
          j += 8 + clen + (clen & 1)
        }
        return Some(frames.toIndexedSeq)
      }
      i += 8 + len + (len & 1)
    }
    None
  }

  /** Real AVI encoder (inverse of [[aviParse]]/[[aviFrames]]): RIFF/AVI
    * with an 'hdrl' LIST holding the 56-byte avih and a 'movi' LIST of
    * '00db' uncompressed frame chunks. */
  def aviEncode(width: Int, height: Int, frames: Seq[Array[Byte]],
                usPerFrame: Int = 33333): Array[Byte] = {
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(tag.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + body.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length).put(kind.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height) // + 16 reserved zero bytes
    val hdrl = list("hdrl", chunk("avih", avih.array()))
    val movi = list("movi", frames.flatMap(f => chunk("00db", f)).toArray)
    val body = hdrl ++ movi
    val b = java.nio.ByteBuffer.allocate(12 + body.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length).put("AVI ".getBytes("US-ASCII")).put(body)
    b.array()
  }

  /** Frame sampling: REAL container-parsed frames for AVI payloads
    * ('..db'/'..dc' chunks out of the movi list), byte-window fallback for
    * opaque payloads (declared stub — splitting arbitrary codecs needs a
    * demuxer library). Emits every `everyNth` frame as
    * (media_id, frame_index, frame, real_container). Narrow — no shuffle. */
  def sampleFrames(df: DataFrame, everyNth: Int, frameBytes: Int = 256): DataFrame = {
    require(everyNth >= 1)
    val slicer = udf((content: Array[Byte]) =>
      if (content == null) Seq.empty[(Int, Array[Byte], Boolean)]
      else aviFrames(content) match {
        case Some(frames) => frames.zipWithIndex.collect {
          case (frame, idx) if idx % everyNth == 0 => (idx, frame, true)
        }.toSeq
        case None => content.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyNth == 0 => (idx, frame, false)
        }.toSeq
      })
    df.select(col("media_id"), explode(slicer(col("content"))).as("f"))
      .select(col("media_id"), col("f._1").as("frame_index"), col("f._2").as("frame"),
        col("f._3").as("real_container"))
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
