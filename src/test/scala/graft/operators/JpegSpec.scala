package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: encode→decode round-trip error bounds, marker/
  * profile guards, and the perceptual law the codec exists for — JPEG
  * compression must barely move the dHash. */
class JpegSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h)(i => (((i % w) * 255 / math.max(w - 1, 1) +
      (i / w) * 97 / math.max(h - 1, 1)) % 256).toByte)

  private def texture(w: Int, h: Int, k: Long): Array[Byte] =
    Array.tabulate[Byte](w * h) { i =>
      val x = (i % w).toLong; val y = (i / w).toLong
      ((x * x * (1 + k % 5) + y * y * (2 + k % 7) + x * y * (k % 11)) % 256).toByte
    }

  test("solid images round-trip to a uniform plane within quantization error") {
    for (v <- Seq(0, 17, 128, 200, 255); (w, h) <- Seq((8, 8), (18, 16), (23, 9))) {
      val px = Array.fill[Byte](w * h)(v.toByte)
      val jpg = Jpeg.encodeGray(w, h, px, quality = 90)
      val Some((dw, dh, luma)) = Jpeg.decodeLuma(jpg)
      assert((dw, dh) === (w, h))
      val vals = luma.map(_ & 0xff).distinct
      assert(vals.length === 1, s"solid $v decoded to ${vals.length} distinct values")
      assert(math.abs(vals(0) - v) <= 2, s"solid $v decoded as ${vals(0)}")
    }
  }

  test("gradient round-trip: bounded error at quality 95, deterministic bytes") {
    val (w, h) = (64, 48)
    val px = gradient(w, h)
    val jpg = Jpeg.encodeGray(w, h, px, quality = 95)
    assert(jpg.toSeq === Jpeg.encodeGray(w, h, px, quality = 95).toSeq)
    val Some((dw, dh, luma)) = Jpeg.decodeLuma(jpg)
    assert((dw, dh) === (w, h))
    val maxErr = px.indices.map(i => math.abs((px(i) & 0xff) - (luma(i) & 0xff))).max
    assert(maxErr <= 12, s"quality-95 max pixel error $maxErr")
  }

  test("non-multiple-of-8 sizes crop correctly (edge replication padding)") {
    val (w, h) = (13, 5)
    val px = gradient(w, h)
    val Some((dw, dh, luma)) = Jpeg.decodeLuma(Jpeg.encodeGray(w, h, px, quality = 100))
    assert((dw, dh) === (w, h) && luma.length === w * h)
  }

  test("guards: truncated stream, non-JPEG bytes, progressive SOF rejected") {
    assert(Jpeg.decodeLuma(null) === None)
    assert(Jpeg.decodeLuma(Array[Byte](1, 2, 3)) === None)
    assert(Jpeg.decodeLuma("not a jpeg at all".getBytes) === None)
    val ok = Jpeg.encodeGray(16, 16, gradient(16, 16))
    assert(Jpeg.decodeLuma(ok.take(ok.length / 2)) === None)
    // flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be refused, not mangled
    val prog = ok.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xff &&
      i + 1 < prog.length && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decodeLuma(prog) === None)
  }

  test("perceptual law: JPEG compression moves the dHash of EVERY planted texture class by <= 16 bits") {
    // the planted-texture universe is 5*7*11 = 385 classes regardless of
    // scale factor (k enters mod 5/7/11) — checking all of them here is
    // what makes the jpeg_phash_props pin SF-independent. These aliased
    // quadratic textures are adversarially high-frequency for a DCT
    // codec (bit flips come from near-TIED adjacent cell means, where an
    // ulp of DCT error flips a comparison); the exhaustive worst at the
    // query's quality 90 is 11 bits (near-lossless quality 100 measures
    // 3), bound pinned with margin at 16 — still half the 32-bit random
    // baseline.
    val (w, h) = (18, 16)
    var worst = 0
    for (k <- 0L until 385L) {
      val px = texture(w, h, k)
      val png = Multimodal.pngEncode(w, h, 0, px)
      val pngHash = Multimodal.pngDHash64(png).get
      val jpgHash = Jpeg.jpegDHash64(Jpeg.encodeGray(w, h, px, quality = 90)).get
      val d = java.lang.Long.bitCount(pngHash ^ jpgHash)
      worst = math.max(worst, d)
      assert(d <= 16, s"texture class $k: dHash moved $d bits under JPEG")
    }
    info(s"worst dHash displacement across all 385 texture classes: $worst bits")
  }

  test("dhashImagesDF dispatches by magic bytes: PNG, JPEG, junk in one column") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val (w, h) = (18, 16)
    val px = texture(w, h, 7L)
    val rows = Seq(
      (1L, Multimodal.pngEncode(w, h, 0, px)),
      (2L, Jpeg.encodeGray(w, h, px, quality = 90)),
      (3L, "not an image".getBytes))
    val got = Multimodal.dhashImagesDF(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toMap
    assert(got(1L)._2 && got(2L)._2 && !got(3L)._2)
    assert(got(3L)._1 === None)
    val d = java.lang.Long.bitCount(got(1L)._1.get ^ got(2L)._1.get)
    assert(d <= 16, s"PNG vs JPEG dHash of one picture moved $d bits")
  }

  test("interop: the decoder reads what javax.imageio writes (real-world baseline)") {
    // the JDK's ImageIO JPEG writer is an independent baseline implementation;
    // decoding its output proves the marker walk + Huffman + IDCT against
    // bytes this codec did not produce
    val (w, h) = (40, 24)
    val px = gradient(w, h)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < w * h) { img.getRaster.setSample(i % w, i / w, 0, px(i) & 0xff); i += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val Some((dw, dh, luma)) = Jpeg.decodeLuma(bos.toByteArray)
    assert((dw, dh) === (w, h))
    val maxErr = px.indices.map(i => math.abs((px(i) & 0xff) - (luma(i) & 0xff))).max
    assert(maxErr <= 16, s"cross-implementation max pixel error $maxErr")
  }
}
