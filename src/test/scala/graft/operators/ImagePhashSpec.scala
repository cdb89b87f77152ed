package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ImagePhashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def grayPng(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val px = Array.tabulate[Byte](w * h)(i => (v(i % w, i / w) & 0xff).toByte)
    Multimodal.pngEncode(w, h, 0, px)
  }

  test("dHash is invariant to uniform brightness shift") {
    val a = Multimodal.pngDHash64(grayPng(18, 16)((x, y) => (x * 13 + y * 7) % 200)).get
    val b = Multimodal.pngDHash64(grayPng(18, 16)((x, y) => (x * 13 + y * 7) % 200 + 50)).get
    assert(a === b)
  }

  test("distinct textures hash differently; flat image hashes to zero") {
    val a = Multimodal.pngDHash64(grayPng(18, 16)((x, y) => (x * x * 3 + y * y) % 256)).get
    val b = Multimodal.pngDHash64(grayPng(18, 16)((x, y) => (x * 5 + y * y * 7) % 256)).get
    assert(a !== b)
    assert(Multimodal.pngDHash64(grayPng(18, 16)((_, _) => 128)).get === 0L)
  }

  test("gray and RGB encodings of the same luma hash identically") {
    def lum(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val gray = Multimodal.pngDHash64(grayPng(18, 16)(lum)).get
    // RGB with R=G=B=v: luma = (299v+587v+114v)/1000 = v exactly
    val px = Array.tabulate[Byte](18 * 16 * 3)(i => (lum((i / 3) % 18, i / 3 / 18) & 0xff).toByte)
    val rgb = Multimodal.pngDHash64(Multimodal.pngEncode(18, 16, 2, px)).get
    assert(gray === rgb)
  }

  test("tiny images (below the 9x8 grid) still hash without error") {
    assert(Multimodal.pngDHash64(grayPng(3, 2)((x, y) => x * 90 + y * 40)).isDefined)
    assert(Multimodal.pngDHash64(grayPng(1, 1)((_, _) => 7)).isDefined)
  }

  test("undecodable content yields None / null hash row") {
    assert(Multimodal.pngDHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.pngDHash64(null).isEmpty)
    import spark.implicits._
    val df = Seq((1L, Array[Byte](9, 9))).toDF("media_id", "content")
    val out = Multimodal.dhashImagesDF(df).collect()(0)
    assert(out.isNullAt(1) && !out.getBoolean(2))
  }

  private def wav(n: Int, ch: Int = 1)(v: Int => Int): Array[Byte] = {
    val samples = Array.tabulate[Short](n * ch)(i => (v(i / ch)).toShort)
    Multimodal.wavEncode(8000, ch, samples)
  }

  test("audio envelope hash is invariant to uniform amplitude scaling") {
    val a = Multimodal.wavEnvelopeHash64(wav(650)(t => (t * t % 900) - 450)).get
    val b = Multimodal.wavEnvelopeHash64(wav(650)(t => ((t * t % 900) - 450) * 2)).get
    assert(a === b)
  }

  test("audio: identical clips collide, different textures differ, stereo mixdown matches mono") {
    def s(t: Int): Int = (t * t * 3 + t * 5) % 2001 - 1000
    val mono = Multimodal.wavEnvelopeHash64(wav(650)(s)).get
    assert(mono === Multimodal.wavEnvelopeHash64(wav(650)(s)).get)
    val other = Multimodal.wavEnvelopeHash64(wav(650)(t => (t * 7) % 1800 - 900)).get
    assert(mono !== other)
    assert(mono === Multimodal.wavEnvelopeHash64(wav(650, ch = 2)(s)).get)
  }

  test("audio: short clips hash; empty/undecodable yield None") {
    assert(Multimodal.wavEnvelopeHash64(wav(5)(t => t * 100)).isDefined)
    assert(Multimodal.wavEnvelopeHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.wavEnvelopeHash64(wav(0)(_ => 0)).isEmpty)
  }

  private def avi(nFrames: Int, frameBytes: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val frames = (0 until nFrames).map(f =>
      Array.tabulate[Byte](frameBytes)(j => (v(f, j) & 0xff).toByte))
    Multimodal.aviEncode(8, 4, frames)
  }

  test("video clip fingerprint: identical clips collide, brightness offset is invariant") {
    def v(f: Int, j: Int): Int = (f * f * 3 + j * 5) % 200
    val a = Multimodal.aviEnvelopeHash64(avi(130, 32)(v)).get
    assert(a === Multimodal.aviEnvelopeHash64(avi(130, 32)(v)).get)
    // +40 on every byte of every (equal-size) frame shifts all windows equally
    assert(a === Multimodal.aviEnvelopeHash64(avi(130, 32)((f, j) => v(f, j) + 40)).get)
    val other = Multimodal.aviEnvelopeHash64(avi(130, 32)((f, j) => (f * 11 + j) % 220)).get
    assert(a !== other)
  }

  test("video: short clips hash; undecodable/empty yield None") {
    assert(Multimodal.aviEnvelopeHash64(avi(3, 8)((f, j) => f * 50 + j)).isDefined)
    assert(Multimodal.aviEnvelopeHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.aviEnvelopeHash64(avi(0, 8)((_, _) => 0)).isEmpty)
  }

  test("pairsFromSignatures64 finds exactly the identical-texture pairs") {
    import spark.implicits._
    def tex(k: Long)(x: Int, y: Int): Int =
      ((x * x * (1 + k % 5) + y * y * (2 + k % 7) + x * y * (k % 11)) % 256).toInt
    // ids 0,1 share texture k=0; ids 2,3 share k=1; id 4 alone on k=2
    val media = (0L to 4L).map(id => (id, grayPng(18, 16)(tex(id / 2)))).toDF("media_id", "content")
    val sigs = Multimodal.dhashImagesDF(media)
      .select(col("media_id").as("doc_id"), col("dhash").as("sig"))
    val pairs = Dedup.pairsFromSignatures64(sigs, maxHamming = 3, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(pairs.map(p => (p._1, p._2)).contains((0L, 1L)))
    assert(pairs.map(p => (p._1, p._2)).contains((2L, 3L)))
    assert(pairs.filter(p => p._1 == 0L && p._2 == 1L).head._3 === 0)
    // id 4's texture must not be within hamming 3 of the others here
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
