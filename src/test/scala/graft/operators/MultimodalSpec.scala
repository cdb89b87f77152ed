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

  test("sampleFrames explodes fixed windows with stride") {
    import spark.implicits._
    val video = Seq((10L, Array.tabulate[Byte](1024)(_.toByte))).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(video, everyNth = 2, frameBytes = 256).collect()
    // 4 windows of 256 bytes, every 2nd -> indexes 0, 2
    assert(frames.map(_.getInt(1)).sorted.toSeq === Seq(0, 2))
  }

  test("meanFeaturesByModality aggregates the feature column") {
    val out = Multimodal.meanFeaturesByModality(Multimodal.extractFeatures(media()).toDF())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("image" -> 3L, "audio" -> 1L))
  }
}
