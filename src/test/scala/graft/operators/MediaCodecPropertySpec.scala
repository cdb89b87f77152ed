package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trip laws for the three pure-JVM media codecs:
  * decode(encode(x)) == x for arbitrary valid inputs, and decode never
  * throws on arbitrary or corrupted bytes (it returns None / declines).
  * Raw ScalaCheck generators with fixed seeds (scalatestplus isn't on the
  * offline classpath), so runs are reproducible. */
class MediaCodecPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 40): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0xBEEFL + i)))

  private val dims = Gen.zip(Gen.choose(1, 24), Gen.choose(1, 18))

  test("PNG: decode . encode == id for every color type, filter and content") {
    val cases = for {
      (w, h) <- dims
      ct <- Gen.oneOf(0, 2, 4, 6)
      filter <- Gen.oneOf(-1, 0, 1, 2, 3, 4)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (w, h, ct, filter, seed)
    for ((w, h, ct, filter, seed) <- samples(cases, 60)) {
      val ch = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(ct)
      val rnd = new scala.util.Random(seed.toLong)
      val px = Array.fill[Byte](w * h * ch)(rnd.nextInt(256).toByte)
      val Some(r) = Multimodal.pngDecode(Multimodal.pngEncode(w, h, ct, px, filterType = filter)): @unchecked
      assert(r.width === w && r.height === h, s"($w x $h ct=$ct f=$filter)")
      assert(r.samples.toSeq === px.toSeq, s"($w x $h ct=$ct f=$filter)")
    }
  }

  test("PNG palette: decode expands indices through any palette") {
    val cases = for {
      (w, h) <- dims
      nColors <- Gen.choose(1, 16)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (w, h, nColors, seed)
    for ((w, h, nColors, seed) <- samples(cases)) {
      val rnd = new scala.util.Random(seed.toLong)
      val palette = Array.fill[Byte](nColors * 3)(rnd.nextInt(256).toByte)
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(nColors).toByte)
      val Some(r) = Multimodal.pngDecode(
        Multimodal.pngEncode(w, h, 3, idx, palette = palette, filterType = 1)): @unchecked
      val expected = idx.flatMap(i => palette.slice((i & 0xff) * 3, (i & 0xff) * 3 + 3))
      assert(r.samples.toSeq === expected.toSeq, s"($w x $h colors=$nColors)")
    }
  }

  test("WAV: decode . encode == id for any rate, channel count and samples") {
    val cases = for {
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      channels <- Gen.choose(1, 4)
      frames <- Gen.choose(0, 200)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (rate, channels, frames, seed)
    for ((rate, channels, frames, seed) <- samples(cases)) {
      val rnd = new scala.util.Random(seed.toLong)
      val s = Array.fill[Short](frames * channels)(rnd.nextInt(65536).toShort)
      val Some(a) = Multimodal.wavDecode(Multimodal.wavEncode(rate, channels, s)): @unchecked
      assert(a.sampleRate === rate && a.channels === channels)
      assert(a.samples.toSeq === s.toSeq)
    }
  }

  test("AVI: frames round-trip for any frame count and sizes (incl. odd)") {
    val cases = for {
      n <- Gen.choose(0, 12)
      sizes <- Gen.listOfN(n, Gen.choose(0, 64))
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (sizes, seed)
    for ((sizes, seed) <- samples(cases)) {
      val rnd = new scala.util.Random(seed.toLong)
      val frames = sizes.map(sz => Array.fill[Byte](sz)(rnd.nextInt(256).toByte))
      val avi = Multimodal.aviEncode(64, 48, frames)
      val Some(meta) = Multimodal.aviParse(avi): @unchecked
      assert(meta.totalFrames === frames.length)
      val Some(out) = Multimodal.aviFrames(avi): @unchecked
      assert(out.map(_.toSeq) === frames.map(_.toSeq).toIndexedSeq)
    }
  }

  test("decoders never throw on arbitrary byte soup") {
    val soup = Gen.choose(0, 500).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127)))
    for (bytes <- samples(soup, 80)) {
      val arr = bytes.map(_.toByte).toArray
      Multimodal.pngDecode(arr) // values unused; the law is "no throw"
      Multimodal.wavDecode(arr)
      Multimodal.aviParse(arr)
      Multimodal.aviFrames(arr)
      Multimodal.parseDimensions(arr)
    }
  }

  test("decoders never throw on corrupted valid containers (bit flips)") {
    val png = Multimodal.pngEncode(6, 5, 2, Array.tabulate[Byte](90)(_.toByte))
    val wav = Multimodal.wavEncode(8000, 1, Array.tabulate[Short](50)(_.toShort))
    val avi = Multimodal.aviEncode(8, 8, Seq(Array[Byte](1, 2, 3)))
    val cases = Gen.zip(Gen.oneOf(0, 1, 2), Gen.choose(0, 200), Gen.choose(0, 7))
    for ((which, pos, bit) <- samples(cases, 120)) {
      val src = Seq(png, wav, avi)(which)
      val mutated = src.clone()
      val p = pos % mutated.length
      mutated(p) = (mutated(p) ^ (1 << bit)).toByte
      Multimodal.pngDecode(mutated)
      Multimodal.wavDecode(mutated)
      Multimodal.aviFrames(mutated)
    }
  }
}
