package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property laws for the round-7 operators. Raw ScalaCheck generators with
  * fixed seeds (scalatestplus isn't on the offline classpath), evaluated
  * through real Spark plans in one batched pass per law. */
class Round7PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0x5EEDL + i)))

  // text that may or may not contain PII-looking fragments
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(8, Gen.oneOf(
      "alpha", "beta", "x1", "42", "a@b.co", "127.0.0.1", "987-65-4321",
      "(415) 555-0142", "4111-1111-1111-1111", "dots..here", "-", "@", ""))
  } yield words.mkString(" ")

  test("redaction is idempotent and leaves no matchable residue") {
    import spark.implicits._
    val texts = samples(textGen).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = df.select(
      Redaction.redact(col("text")).as("once"),
      Redaction.redact(Redaction.redact(col("text"))).as("twice"),
      Redaction.redactionCount(Redaction.redact(col("text"))).as("residue"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) === r.getString(1), "redact must be idempotent")
      assert(r.getLong(2) === 0L, s"residue in '${r.getString(0)}'")
    }
  }

  test("temperature cutoffs: monotone in count inverse, bounded, grid-aligned") {
    val countsGen = for {
      k <- Gen.choose(2, 6)
      ns <- Gen.listOfN(k, Gen.choose(1L, 100000L))
    } yield ns.zipWithIndex.map { case (n, i) => s"s$i" -> n }.toMap
    for (counts <- samples(countsGen, 40)) {
      val cut = Sampling.temperatureMixCutoffs(counts, temperature = 2.0, targetFraction = 0.5)
      assert(cut.keySet === counts.keySet)
      cut.values.foreach(c => assert(c >= 0L && c <= 4294967296L && c % (1L << 20) == 0L))
      // a strictly smaller source never gets a strictly smaller rate
      for (a <- counts.keys; b <- counts.keys if counts(a) < counts(b))
        assert(cut(a) >= cut(b), s"$counts -> $cut")
    }
  }

  test("gap-fill invariants: spine is dense, fill is total, observed preserved") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 400L), Gen.choose(0, 999)))
    } yield rows.map { case (k, s, v) => (k, s * 1000000000L, v / 10.0) }
    for ((rows, i) <- samples(rowsGen, 25).zipWithIndex) {
      val df = rows.toDF("k", "ts", "v")
      val out = Resample.gapFillForward(df, "k", "ts", "v", bucketSeconds = 60L)
        .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getDouble(3)))
      val byKey = out.groupBy(_._1)
      for ((k, buckets) <- byKey) {
        val bs = buckets.map(_._2).sorted.toSeq
        assert(bs === (bs.head to bs.last).toSeq, s"dense spine, case $i: $bs")
        buckets.foreach { case (_, _, obs, filled) =>
          obs.foreach(o => assert(o === filled, s"observed bucket must keep its value, case $i"))
        }
        // expected per-bucket max
        val expect = rows.filter(_._1 == k).groupBy(_._2 / 60000000000L)
          .map { case (b, rs) => b -> rs.map(_._3).max }
        expect.foreach { case (b, v) =>
          val got = buckets.find(_._2 == b).get
          assert(got._3 === Some(v), s"case $i bucket $b")
        }
      }
    }
  }

  test("bm25: a document gaining a query term never drops below its old self") {
    import spark.implicits._
    // fixed corpus; compare rank of doc with tf=2 vs tf=1 at equal dl
    val df = Seq(
      (1L, "hash hash filler filler"),
      (2L, "hash word filler filler"),
      (3L, "other words here today")).toDF("doc_id", "text")
    val out = Ranking.bm25TopK(df, "doc_id", "text", Seq("hash"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val score = out.toMap
    assert(score(1L) > score(2L), s"tf monotonicity: $score")
    assert(!score.contains(3L))
  }
}
