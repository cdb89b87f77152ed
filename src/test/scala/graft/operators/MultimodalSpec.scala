package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def media() = {
    import spark.implicits._
    Seq(
      Multimodal.MediaRecord(1L, "image", "png", "fake-png-bytes-1".getBytes),
      Multimodal.MediaRecord(2L, "image", "jpg", "fake-jpg-bytes-22".getBytes),
      Multimodal.MediaRecord(3L, "audio", "wav", "fake-wav-bytes-333".getBytes),
      Multimodal.MediaRecord(4L, "image", "png", Array.emptyByteArray)).toDS()
  }

  test("extractFeatures: deterministic stub features, 8-dim, byte counts kept") {
    val out = Multimodal.extractFeatures(media()).collect().sortBy(_.media_id)
    assert(out.length === 4)
    assert(out.forall(_.features.length === 8))
    assert(out(0).n_bytes === 16)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media()).collect().sortBy(_.media_id)
    assert(out.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
    // empty payload degrades cleanly
    assert(out(3).width === 0 && out(3).features.forall(_ === 0f))
  }

  test("extractFeatures via DataFrame entry keeps schema contract") {
    val df = Multimodal.extractFeaturesDF(media().toDF())
    assert(df.columns.toSeq === Seq("media_id", "modality", "width", "height", "n_bytes", "features"))
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
