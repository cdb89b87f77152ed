package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Quantization

class QuantExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def vecsDF(vs: Seq[Seq[Float]]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
  }

  test("quantize round-trips within scale/2 and hits exact grid points") {
    val df = Quantization.quantizeWithError(
      vecsDF(Seq(
        Seq(1.0f, -1.0f, 0.5f, 0.0f),
        Seq(0.1f, 0.2f, -0.3f, 0.05f))), "embedding")
    val rows = df.orderBy("vec_id").collect()

    val r0 = rows(0)
    val scale0 = r0.getAs[Double]("scale")
    assert(math.abs(scale0 - 1.0 / 127.0) < 1e-15)
    // 1.0 -> 127, -1.0 -> -127, 0.5 -> floor(63.5 + 0.5) = 64, 0 -> 0
    assert(r0.getAs[collection.Seq[Int]]("q").toSeq === Seq(127, -127, 64, 0))
    assert(r0.getAs[Double]("max_err") <= scale0 / 2.0)

    val r1 = rows(1)
    val scale1 = r1.getAs[Double]("scale")
    assert(math.abs(scale1 - 0.3f.toDouble / 127.0) < 1e-15)
    assert(r1.getAs[collection.Seq[Int]]("q").head === math.floor(0.1f.toDouble / scale1 + 0.5).toInt)
    assert(r1.getAs[Double]("max_err") <= scale1 / 2.0)
  }

  test("all-zero vector quantizes to zeros with zero scale and zero error") {
    val r = Quantization.quantizeWithError(vecsDF(Seq(Seq(0f, 0f, 0f))), "embedding").head()
    assert(r.getAs[Double]("scale") === 0.0)
    assert(r.getAs[collection.Seq[Int]]("q") === Seq(0, 0, 0))
    assert(r.getAs[Double]("max_err") === 0.0)
  }

  test("null vector propagates null; null elements quantize to 0") {
    import spark.implicits._
    val df = Seq((0L, Option.empty[Seq[Option[Float]]]),
      (1L, Some(Seq(Some(1.0f), None, Some(-0.5f)))))
      .toDF("vec_id", "embedding")
    val out = Quantization.quantizeInt8(df, "embedding").orderBy("vec_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("q")))
    // -0.5/scale = -63.5; round-half-up: floor(-63.5 + 0.5) = -63
    assert(out(1).getAs[collection.Seq[Int]]("q").toSeq === Seq(127, 0, -63))
  }

  test("interpreted eval agrees with codegen on random vectors") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(50)(Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val df = Quantization.quantizeWithError(vecsDF(vs), "embedding")
    // force interpreted path through a filter on a non-codegen context:
    // compare whole-stage result against per-row Scala recompute
    df.collect().foreach { r =>
      val emb = r.getAs[collection.Seq[Float]]("embedding")
      val scale = emb.map(x => math.abs(x.toDouble)).max / 127.0
      val expected = emb.map { x =>
        val f = math.floor(x.toDouble / scale + 0.5)
        if (f > 127) 127 else if (f < -127) -127 else f.toInt
      }
      assert(r.getAs[collection.Seq[Int]]("q").toSeq === expected)
      assert(r.getAs[Double]("max_err") <= scale / 2.0 + 1e-15)
    }
  }

  test("signProject matches the scalar replay and roughly preserves distances") {
    import spark.implicits._
    val dim = 16; val outDim = 8
    val vecs = (0L until 20L).map { v =>
      v -> (0 until dim).map(i => (((v * 13 + i * 7) % 19).toFloat / 9f) - 1f).toArray
    }
    val got = graft.operators.Quantization.signProject(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", dim, outDim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def sign(i: Int, j: Int): Long =
      if (((i.toLong * 2654435761L + j.toLong * 40503L) / 65536L) % 2L == 0L) 1L else -1L
    def quant(x: Float): Long =
      BigDecimal(x.toDouble * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for ((v, emb) <- vecs) {
      val expect = (0 until outDim).map(j =>
        (0 until dim).map(i => quant(emb(i)) * sign(i, j)).sum)
      assert(got(v).toSeq === expect, s"vec $v")
    }
    // JL sanity: an exact duplicate pair projects to distance 0 while a
    // far pair stays far — the projection cannot conflate them
    val dup = Seq((100L, vecs(0)._2), (101L, vecs(0)._2),
      (102L, vecs(0)._2.map(-_))).toDF("vec_id", "embedding")
    val p = graft.operators.Quantization.signProject(dup, "vec_id", "embedding", dim, outDim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(p(100L) === p(101L))
    def l2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    assert(l2(p(100L), p(102L)) > 0L)
  }
}
