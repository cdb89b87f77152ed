package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def vecs(rows: (Long, Array[Float])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private val rnd = new scala.util.Random(7)
  private def randUnit(dim: Int): Array[Float] = {
    val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    v.map(_ / n)
  }
  private def jitter(v: Array[Float], eps: Float): Array[Float] =
    v.map(x => x + eps * rnd.nextGaussian().toFloat)

  test("brute-force topK returns the planted nearest neighbors in order") {
    val q = randUnit(16)
    val near = jitter(q, 0.01f)  // cosine ~0.9999
    val near2 = jitter(q, 0.05f) // cosine ~0.997
    val others = (10L until 40L).map(i => i -> randUnit(16))
    val df = vecs((Seq(1L -> near, 2L -> near2) ++ others): _*)
    val top = Similarity.topK(df, "vec_id", "embedding", q.map(_.toDouble), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(1L, 2L))
  }

  test("lshTopK finds the same top results as brute force for close vectors") {
    val q = randUnit(64)
    val near = jitter(q, 0.02f)
    val others = (10L until 200L).map(i => i -> randUnit(64))
    val df = vecs((Seq(1L -> near) ++ others): _*)
    val brute = Similarity.topK(df, "vec_id", "embedding", q.map(_.toDouble), 1).collect()(0).getLong(0)
    val approx = Similarity.lshTopK(df, "vec_id", "embedding", q.map(_.toDouble), 1).collect()
    assert(brute === 1L)
    assert(approx.nonEmpty && approx(0).getLong(0) === 1L, "LSH must catch a 0.999-cosine neighbor")
  }

  test("cosinePairsExact finds exactly the planted near-dup pairs") {
    val a = randUnit(32)
    val df = vecs(1L -> a, 2L -> jitter(a, 0.01f), 3L -> randUnit(32), 4L -> randUnit(32))
    val pairs = Similarity.cosinePairsExact(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("cosinePairsLsh recalls planted duplicates without a cartesian plan") {
    val planted = (0L until 20L).map { i =>
      val v = randUnit(64)
      Seq((i * 2) -> v, (i * 2 + 1) -> jitter(v, 0.01f))
    }.flatten
    val noise = (1000L until 1200L).map(i => i -> randUnit(64))
    val df = vecs((planted ++ noise): _*)
    val out = Similarity.cosinePairsLsh(df, "vec_id", "embedding", 0.95)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 20L).map(i => (i * 2, i * 2 + 1)).toSet
    val recall = expected.count(got.contains).toDouble / expected.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9; got ${got.size} pairs")
  }
}
