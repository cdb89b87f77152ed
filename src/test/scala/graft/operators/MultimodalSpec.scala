package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  // --- hand-built header vectors (public formats, spec-derived bytes) ---

  private def gifHeader(w: Int, h: Int, ver: Char = '9'): Array[Byte] =
    Array[Byte]('G', 'I', 'F', '8', ver.toByte, 'a',
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
      0, 0, 0) // packed fields / bg / aspect

  private def bmpHeader(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
    b.array()
  }

  /** SOI + APP0(JFIF) + DQT filler + SOFn(height, width) — the parser must
    * skip the variable-length segments to reach the frame header. */
  private def jpegHeader(w: Int, h: Int, sofMarker: Int = 0xc0): Array[Byte] = {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val app0 = seg(0xe0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = seg(0xdb, Array.fill[Byte](65)(3))
    val sof = seg(sofMarker, Array[Byte](8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3))
    Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ dqt ++ sof
  }

  private def media() = {
    import spark.implicits._
    Seq(
      Multimodal.MediaRecord(1L, "image", "png", Multimodal.pngHeaderBytes(640, 480) ++ "pixels".getBytes),
      Multimodal.MediaRecord(2L, "image", "jpg", jpegHeader(1024, 768)),
      Multimodal.MediaRecord(3L, "audio", "wav", "fake-wav-bytes-333".getBytes),
      Multimodal.MediaRecord(4L, "image", "png", Array.emptyByteArray)).toDS()
  }

  test("parseDimensions: PNG IHDR big-endian dims") {
    assert(Multimodal.parseDimensions(Multimodal.pngHeaderBytes(640, 480)) === Some(("png", 640, 480)))
    assert(Multimodal.parseDimensions(Multimodal.pngHeaderBytes(1, 1)) === Some(("png", 1, 1)))
    // truncated signature / missing IHDR
    assert(Multimodal.parseDimensions(Multimodal.pngHeaderBytes(640, 480).take(20)) === None)
  }

  test("parseDimensions: JPEG baseline and progressive SOF markers") {
    assert(Multimodal.parseDimensions(jpegHeader(1024, 768)) === Some(("jpeg", 1024, 768)))
    assert(Multimodal.parseDimensions(jpegHeader(320, 200, sofMarker = 0xc2)) === Some(("jpeg", 320, 200)))
    // DHT (C4) is not a frame header: prepend one, parser must skip it
    val withDht = jpegHeader(12, 34).patch(2,
      Array(0xff.toByte, 0xc4.toByte, 0x00.toByte, 0x04.toByte, 1.toByte, 2.toByte), 0)
    assert(Multimodal.parseDimensions(withDht) === Some(("jpeg", 12, 34)))
    // truncated before any SOF
    assert(Multimodal.parseDimensions(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) === None)
    // desynced stream (no FF where a marker should be)
    assert(Multimodal.parseDimensions(Array(0xff.toByte, 0xd8.toByte, 1.toByte, 2.toByte, 3.toByte)) === None)
  }

  test("parseDimensions: GIF little-endian screen size, both versions") {
    assert(Multimodal.parseDimensions(gifHeader(800, 600)) === Some(("gif", 800, 600)))
    assert(Multimodal.parseDimensions(gifHeader(300, 70000 & 0xffff, ver = '7')) === Some(("gif", 300, 70000 & 0xffff)))
    assert(Multimodal.parseDimensions("GIF8".getBytes) === None)
  }

  test("parseDimensions: BMP little-endian, negative height = top-down") {
    assert(Multimodal.parseDimensions(bmpHeader(1920, 1080)) === Some(("bmp", 1920, 1080)))
    assert(Multimodal.parseDimensions(bmpHeader(64, -64)) === Some(("bmp", 64, 64)))
  }

  test("parseDimensions: unknown bytes, null, empty") {
    assert(Multimodal.parseDimensions("plain text payload".getBytes) === None)
    assert(Multimodal.parseDimensions(null) === None)
    assert(Multimodal.parseDimensions(Array.emptyByteArray) === None)
  }

  // --- real PNG pixel decode (encoder is the spec-exact inverse) ---------

  private def gradient(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch)(i => ((i * 31 + (i / ch) * 7) % 256).toByte)

  test("pngDecode round-trips the encoder for color types 0/2/4/6") {
    for (ct <- Seq(0, 2, 4, 6)) {
      val ch = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(ct)
      val px = gradient(13, 9, ch)
      val Some(r) = Multimodal.pngDecode(Multimodal.pngEncode(13, 9, ct, px)): @unchecked
      assert(r.width === 13 && r.height === 9 && r.channels === ch, s"ct=$ct")
      assert(r.samples.toSeq === px.toSeq, s"ct=$ct samples differ")
    }
  }

  test("pngDecode round-trips every PNG filter type, including mixed per-row") {
    val px = gradient(16, 10, 3)
    for (f <- Seq(0, 1, 2, 3, 4, -1)) {
      val Some(r) = Multimodal.pngDecode(Multimodal.pngEncode(16, 10, 2, px, filterType = f)): @unchecked
      assert(r.samples.toSeq === px.toSeq, s"filter=$f")
    }
  }

  test("pngDecode expands a palette image to RGB") {
    val palette = Array.tabulate[Byte](12)(i => (i * 11).toByte) // 4 entries
    val idx = Array.tabulate[Byte](6 * 4)(i => (i % 4).toByte)
    val Some(r) = Multimodal.pngDecode(
      Multimodal.pngEncode(6, 4, 3, idx, palette = palette, filterType = 1)): @unchecked
    assert(r.channels === 3 && r.colorType === 2)
    val expected = idx.flatMap(i => palette.slice((i & 0xff) * 3, (i & 0xff) * 3 + 3))
    assert(r.samples.toSeq === expected.toSeq)
  }

  test("pngDecode falls back (None) on malformed streams instead of throwing") {
    val good = Multimodal.pngEncode(8, 8, 2, gradient(8, 8, 3))
    // truncated IDAT (drop the last 20 bytes incl IEND + tail of IDAT)
    assert(Multimodal.pngDecode(good.dropRight(20) ++ good.takeRight(12)) === None)
    // corrupt deflate payload
    val corrupt = good.clone(); corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    assert(Multimodal.pngDecode(corrupt) === None || Multimodal.pngDecode(corrupt).isDefined) // must not throw
    // bad filter byte: hand-build raw stream with filter 9
    val raw = Array[Byte](9, 1, 2, 3) // 1x1 RGB scanline, invalid filter
    val deflater = new java.util.zip.Deflater(); deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](64); val n = deflater.deflate(buf); deflater.end()
    val header = Multimodal.pngHeaderBytes(1, 1)
    val idat = {
      val b = java.nio.ByteBuffer.allocate(12 + n)
      b.putInt(n).put("IDAT".getBytes("US-ASCII")).put(buf, 0, n).putInt(0)
      b.array()
    }
    val iend = java.nio.ByteBuffer.allocate(12).putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0).array()
    assert(Multimodal.pngDecode(header ++ idat ++ iend) === None)
    // interlaced / 16-bit depth profiles decline to the stub
    val interlaced = good.clone(); interlaced(28) = 1 // IHDR interlace byte
    assert(Multimodal.pngDecode(interlaced) === None)
    val deep = good.clone(); deep(24) = 16 // IHDR bit depth
    assert(Multimodal.pngDecode(deep) === None)
  }

  test("pngDecode survives a crafted near-2^31 width header (Long sizing)") {
    // width 0x7fffff00 x height 3: stride overflows Int if computed in Int
    val bytes = Multimodal.pngHeaderBytes(0x7fffff00, 3)
    assert(Multimodal.pngDecode(bytes) === None) // no NegativeArraySizeException
    assert(Multimodal.decode(bytes)._4.length === 8) // stub fallback path
  }

  test("pngPixelFeatures: exact mean/std on solid and gradient images") {
    // solid RGB (40, 80, 120): means are v/255, stds 0, alpha opaque
    val solid = Array.tabulate[Byte](5 * 4 * 3)(i => Seq(40, 80, 120)(i % 3).toByte)
    val Some(f) = Multimodal.pngPixelFeatures(Multimodal.pngEncode(5, 4, 2, solid)): @unchecked
    assert(f(0) === 40f / 255f && f(1) === 80f / 255f && f(2) === 120f / 255f && f(3) === 1f)
    assert(f(4) === 0f && f(5) === 0f && f(6) === 0f && f(7) === 0f)

    // gray gradient 0..255 over a 16x16 image: mean 127.5/255, known std
    val gray = Array.tabulate[Byte](256)(_.toByte)
    val Some(g) = Multimodal.pngPixelFeatures(Multimodal.pngEncode(16, 16, 0, gray)): @unchecked
    assert(math.abs(g(0) - 0.5f) < 1e-3 && g(0) === g(1) && g(1) === g(2))
    val expectedStd = math.sqrt((0 until 256).map(v => math.pow(v - 127.5, 2)).sum / 256) / 255.0
    assert(math.abs(g(4) - expectedStd) < 1e-3 && g(7) === 0f)
  }

  test("resizePng: nearest-neighbor downscale samples the exact source pixels") {
    // 4x4 gray image with values 0,16,32,... row-major; 2x2 nearest-neighbor
    // resize samples source pixels (0,0),(0,2),(2,0),(2,2) -> 0,32,128,160
    val px = Array.tabulate[Byte](16)(i => (i * 16).toByte)
    val Some(resized) = Multimodal.resizePng(Multimodal.pngEncode(4, 4, 0, px), 2, 2): @unchecked
    val Some(r) = Multimodal.pngDecode(resized): @unchecked
    assert(r.width === 2 && r.height === 2 && r.channels === 1)
    assert(r.samples.map(_ & 0xff).toSeq === Seq(0, 32, 128, 160))

    // solid color survives any resize exactly
    val solid = Array.fill[Byte](5 * 3 * 3)(77)
    val Some(up) = Multimodal.resizePng(Multimodal.pngEncode(5, 3, 2, solid), 9, 7): @unchecked
    val Some(u) = Multimodal.pngDecode(up): @unchecked
    assert(u.width === 9 && u.height === 7 && u.samples.forall(_ === 77.toByte))

    // undecodable bytes decline; zero target dims decline
    assert(Multimodal.resizePng("junk".getBytes, 2, 2) === None)
    assert(Multimodal.resizePng(Multimodal.pngEncode(4, 4, 0, px), 0, 2) === None)
  }

  test("resizeImagesDF: pass-through for non-PNG payloads, resized flag kept") {
    import spark.implicits._
    val png = Multimodal.pngEncode(8, 8, 2, Array.fill[Byte](8 * 8 * 3)(10))
    val df = Seq((1L, png), (2L, "not an image".getBytes)).toDF("media_id", "content")
    val out = Multimodal.resizeImagesDF(df, 4, 4).collect().sortBy(_.getLong(0))
    assert(out(0).getBoolean(2) === true)
    val Some(r) = Multimodal.pngDecode(out(0).getAs[Array[Byte]](1)): @unchecked
    assert(r.width === 4 && r.height === 4)
    assert(out(1).getBoolean(2) === false)
    assert(out(1).getAs[Array[Byte]](1).toSeq === "not an image".getBytes.toSeq)
  }

  // --- real WAV (RIFF/PCM) decode ----------------------------------------

  test("wavDecode round-trips the encoder, mono and stereo") {
    val mono = Array.tabulate[Short](480)(i => ((i * 37 - 7000) % 32768).toShort)
    val Some(m) = Multimodal.wavDecode(Multimodal.wavEncode(8000, 1, mono)): @unchecked
    assert(m.sampleRate === 8000 && m.channels === 1 && m.bitsPerSample === 16)
    assert(m.samples.toSeq === mono.toSeq)

    val stereo = Array.tabulate[Short](480)(i => (i * 13 - 3000).toShort)
    val Some(s) = Multimodal.wavDecode(Multimodal.wavEncode(44100, 2, stereo)): @unchecked
    assert(s.channels === 2 && s.samples.toSeq === stereo.toSeq)
  }

  test("wavDecode skips ancillary chunks and rejects non-PCM16 profiles") {
    val bytes = Multimodal.wavEncode(16000, 1, Array.tabulate[Short](100)(_.toShort))
    // splice a LIST chunk between fmt and data (offset 36 = start of 'data')
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = bytes.take(36) ++ list ++ bytes.drop(36)
    val Some(a) = Multimodal.wavDecode(spliced): @unchecked
    assert(a.samples.length === 100)

    // IEEE-float format tag (3) declines
    val floatFmt = bytes.clone(); floatFmt(20) = 3
    assert(Multimodal.wavDecode(floatFmt) === None)
    // 8-bit declines
    val eightBit = bytes.clone(); eightBit(34) = 8
    assert(Multimodal.wavDecode(eightBit) === None)
    // truncated data chunk declines
    assert(Multimodal.wavDecode(bytes.dropRight(10)) === None)
    // not RIFF at all
    assert(Multimodal.wavDecode("definitely not audio bytes + padding to 44".getBytes) === None)
    assert(Multimodal.wavDecode(null) === None)
  }

  test("wavFeatures: exact statistics on constant and alternating signals") {
    // constant DC +1200, mono: mean=rms=peak=1200/32768, zcr 0
    val dc = Multimodal.wavDecode(Multimodal.wavEncode(8000, 1, Array.fill[Short](256)(1200))).get
    val f = Multimodal.wavFeatures(dc)
    assert(f(0) === 1200f / 32768f && f(1) === f(0))
    assert(f(2) === 1200f / 32768f && f(3) === f(2))
    assert(f(4) === 1200f / 32768f && f(5) === f(4) && f(6) === f(4))
    assert(f(7) === 0f)

    // alternating +/-v, mono: mean 0, rms v, zero-cross rate 1
    val alt = Multimodal.wavDecode(Multimodal.wavEncode(8000, 1,
      Array.tabulate[Short](200)(i => if (i % 2 == 0) 9000 else -9000))).get
    val g = Multimodal.wavFeatures(alt)
    assert(g(0) === 0f && g(2) === 9000f / 32768f && g(7) === 1f)
    assert(g(4) === -9000f / 32768f && g(5) === 9000f / 32768f && g(6) === 9000f / 32768f)

    // stereo with distinct channels: per-channel means separate
    val st = Multimodal.wavDecode(Multimodal.wavEncode(8000, 2,
      Array.tabulate[Short](64)(i => if (i % 2 == 0) 100 else -300))).get
    val h = Multimodal.wavFeatures(st)
    assert(h(0) === 100f / 32768f && h(1) === -300f / 32768f)
  }

  test("extractAudioFeaturesDF: wav rows decode for real, junk degrades to stub") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.wavEncode(8000, 1, Array.fill[Short](80)(500))),
      (2L, "not audio".getBytes)).toDF("media_id", "content")
    val out = Multimodal.extractAudioFeaturesDF(df).collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) === "wav" && out(0).getInt(2) === 8000)
    assert(out(0).getLong(5) === 80L && out(0).getLong(6) === 10L) // 80 frames @ 8kHz = 10ms
    assert(out(1).getString(1) === "unknown" && out(1).getInt(2) === 0)
  }

  test("extractFeatures: real dims for real headers, stub features, byte counts kept") {
    val out = Multimodal.extractFeatures(media()).collect().sortBy(_.media_id)
    assert(out.length === 4)
    assert(out.forall(_.features.length === 8))
    assert(out(0).format_detected === "png" && out(0).width === 640 && out(0).height === 480)
    assert(out(1).format_detected === "jpeg" && out(1).width === 1024 && out(1).height === 768)
    assert(out(2).format_detected === "unknown" && out(2).width === 0)
    assert(out(2).n_bytes === 18)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media()).collect().sortBy(_.media_id)
    assert(out.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
    // empty payload degrades cleanly
    assert(out(3).width === 0 && out(3).features.forall(_ === 0f))
  }

  test("extractFeatures via DataFrame entry keeps schema contract") {
    val df = Multimodal.extractFeaturesDF(media().toDF())
    assert(df.columns.toSeq === Seq("media_id", "modality", "format_detected", "width", "height", "n_bytes", "features"))
    assert(df.count() === 4)
  }

  test("sampleFrames explodes fixed windows with stride (opaque fallback)") {
    import spark.implicits._
    val video = Seq((10L, Array.tabulate[Byte](1024)(_.toByte))).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(video, everyNth = 2, frameBytes = 256).collect()
    // 4 windows of 256 bytes, every 2nd -> indexes 0, 2
    assert(frames.map(_.getInt(1)).sorted.toSeq === Seq(0, 2))
    assert(frames.forall(!_.getBoolean(3)), "opaque payloads are flagged as stub-split")
  }

  // --- real AVI (RIFF) container -----------------------------------------

  test("aviParse/aviFrames round-trip the encoder; junk declines") {
    val frames = (0 until 5).map(k => Array.fill[Byte](32)(k.toByte))
    val avi = Multimodal.aviEncode(320, 240, frames, usPerFrame = 40000)
    val Some(meta) = Multimodal.aviParse(avi): @unchecked
    assert(meta === Multimodal.AviMeta(320, 240, 5, 40000))
    val Some(out) = Multimodal.aviFrames(avi): @unchecked
    assert(out.length === 5)
    assert(out.zipWithIndex.forall { case (f, k) => f.toSeq === frames(k).toSeq })
    // odd-length frames respect RIFF word alignment
    val odd = Multimodal.aviEncode(8, 8, Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8)))
    val Some(oddOut) = Multimodal.aviFrames(odd): @unchecked
    assert(oddOut.map(_.toSeq) === IndexedSeq(Seq[Byte](1, 2, 3), Seq[Byte](4, 5, 6, 7, 8)))
    assert(Multimodal.aviParse("RIFFxxxxWAVE".getBytes) === None)
    assert(Multimodal.aviParse("garbage".getBytes) === None)
    assert(Multimodal.aviParse(null) === None)
    // truncated container declines instead of throwing
    assert(Multimodal.aviFrames(avi.dropRight(10)) === None)
  }

  test("sampleFrames extracts REAL frames from AVI containers") {
    import spark.implicits._
    val frames = (0 until 6).map(k => Array.fill[Byte](16)((k * 10).toByte))
    val avi = Multimodal.aviEncode(64, 48, frames)
    val df = Seq((7L, avi)).toDF("media_id", "content")
    val out = Multimodal.sampleFrames(df, everyNth = 2).collect().sortBy(_.getInt(1))
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 2, 4))
    assert(out.forall(_.getBoolean(3)), "AVI frames are real-container frames")
    assert(out.map(r => r.getAs[Array[Byte]]("frame")(0)).toSeq === Seq(0.toByte, 20.toByte, 40.toByte))
  }

  test("wavResample: DC exact through up/down-sample; ramp midpoints exact at 2x; junk declines") {
    // constant signal survives any rate change bit-exactly
    val dc = Multimodal.wavEncode(8000, 1, Array.fill[Short](100)(-321))
    val up = Multimodal.wavResample(dc, 12000).get
    val upDecoded = Multimodal.wavDecode(up).get
    assert(upDecoded.sampleRate === 12000)
    assert(upDecoded.samples.length === 150) // floor(100 * 12000 / 8000)
    assert(upDecoded.samples.forall(_ === -321.toShort))
    val down = Multimodal.wavDecode(Multimodal.wavResample(dc, 4000).get).get
    assert(down.samples.length === 50 && down.samples.forall(_ === -321.toShort))

    // linear ramp at exactly 2x: even outputs hit sources, odd hit midpoints
    val ramp = Multimodal.wavEncode(8000, 1, Array.tabulate[Short](10)(i => (i * 100).toShort))
    val r2 = Multimodal.wavDecode(Multimodal.wavResample(ramp, 16000).get).get
    assert(r2.samples.length === 20)
    assert(r2.samples(4) === 200.toShort)  // source index 2
    assert(r2.samples(5) === 250.toShort)  // midpoint of 200 and 300
    // tail clamps to the last source frame
    assert(r2.samples(19) === 900.toShort)

    // stereo: channels resample independently
    val st = Multimodal.wavEncode(8000, 2,
      Array.tabulate[Short](20)(i => if (i % 2 == 0) 1000 else -1000))
    val st2 = Multimodal.wavDecode(Multimodal.wavResample(st, 16000).get).get
    assert(st2.channels === 2)
    assert(st2.samples.grouped(2).forall(p => p(0) === 1000.toShort && p(1) === -1000.toShort))

    assert(Multimodal.wavResample(Array[Byte](1, 2, 3), 16000).isEmpty)
  }

  test("meanFeaturesByModality aggregates the feature column") {
    val out = Multimodal.meanFeaturesByModality(Multimodal.extractFeatures(media()).toDF())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("image" -> 3L, "audio" -> 1L))
  }

  test("pngDecode declines a crafted huge chunk length instead of throwing") {
    // valid signature + a chunk whose declared length would overflow the
    // Int bounds check (0x7FFFFFF0)
    val bytes = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0x7f, 0xff.toByte, 0xff.toByte, 0xf0.toByte, 'I', 'H', 'D', 'R', 0, 0, 0, 0)
    assert(Multimodal.parseDimensions(bytes).isEmpty ||
      Multimodal.parseDimensions(bytes).exists(_._1 == "png")) // header may still parse
    // the pixel decode path must return None, never throw
    assert(Multimodal.resizePng(bytes, 2, 2).isEmpty)
  }

  test("parseDimensions rejects an OS/2 BITMAPCOREHEADER BMP instead of fusing fields") {
    // 'BM' + 12 zero bytes, header size 12 at offset 14 (BITMAPCOREHEADER),
    // 16-bit dims — the INFOHEADER offsets would misread these
    val b = new Array[Byte](26)
    b(0) = 'B'; b(1) = 'M'; b(14) = 12
    b(18) = 64; b(20) = 48 // core-header 16-bit w/h
    assert(Multimodal.parseDimensions(b).isEmpty)
  }
}
