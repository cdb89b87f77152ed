package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val Knuth = 2654435761L
  private val Ring = 4294967296L

  test("isqrt is the exact integer square root across boundary values") {
    import spark.implicits._
    val ns = ((0L to 2000L) ++ Seq(999999L, 1000000L, 1000001L,
      (1L << 31) - 1, 1L << 31, (1L << 31) + 1, 4611686014132420609L /* (2^31-1)^2 */))
    val got = ns.toDF("n").select(col("n"), Mixture.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n =>
      val s = got(n)
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) = $s")
    }
  }

  test("quotas follow isqrt weights with floor division") {
    import spark.implicits._
    // counts 100/9/4/1 -> weights 10/3/2/1, total 16; budget 32 -> 20/6/4/2
    val docs = (Seq.fill(100)("en") ++ Seq.fill(9)("de") ++ Seq.fill(4)("fr") ++ Seq("da"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val got = Mixture.temperatureQuotas(docs.toDF("doc_id", "lang"), "lang", budget = 32L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "en" -> ((100L, 10L, 20L)), "de" -> ((9L, 3L, 6L)),
      "fr" -> ((4L, 2L, 4L)), "da" -> ((1L, 1L, 2L))))
  }

  test("temperature flattens the head: tail share grows, order preserved") {
    import spark.implicits._
    val docs = (Seq.fill(900)("en") ++ Seq.fill(90)("de") ++ Seq.fill(10)("fr"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val q = Mixture.temperatureQuotas(docs.toDF("doc_id", "lang"), "lang", budget = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // raw shares would be 90/9/1; sqrt shares ~ 30/9.5/3.2 of 42.7
    assert(q("en") < 90L && q("fr") > 1L)
    assert(q("en") > q("de") && q("de") > q("fr"))
  }

  test("sample matches the scalar ring-hash window replay and respects quotas") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, Seq("en", "en", "en", "de", "de", "fr")((i % 6L).toInt)))
    val budget = 30L
    val got = Mixture.temperatureSample(docs.toDF("doc_id", "lang"), "doc_id", "lang", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._3))

    // scalar replay
    val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def isqrt(n: Long) = { var s = math.sqrt(n.toDouble).toLong
      while (s * s > n) s -= 1; while ((s + 1) * (s + 1) <= n) s += 1; s }
    val wt = counts.values.map(isqrt).sum
    val quota = counts.map { case (l, n) => l -> budget * isqrt(n) / wt }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (l, ds) =>
      ds.map(_._1).sortBy(id => (id * Knuth % Ring + Ring) % Ring -> id)
        .take(quota(l).toInt).zipWithIndex
        .map { case (id, i) => (l, id, (i + 1).toLong) }
    }.sortBy(x => (x._1, x._3))
    assert(got.toSeq === expected)
    got.groupBy(_._1).foreach { case (l, rows) =>
      assert(rows.length.toLong === quota(l), s"quota for $l")
      assert(rows.map(_._3).sorted.toSeq === (1L to quota(l)), s"ranks for $l")
    }
  }
}
