package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property laws for the round-10 curation operators (caps, MAD outliers,
  * percent-rank calibration, Fleiss stats, blocklist, contamination).
  * Raw ScalaCheck generators with fixed seeds (scalatestplus isn't on the
  * offline classpath), evaluated through real Spark plans. */
class Round10PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int = 30): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0xA10L + i)))

  test("capPerGroup law: every group keeps exactly min(|group|, k) rows") {
    import spark.implicits._
    val caseGen = for {
      sizes <- Gen.listOfN(5, Gen.choose(0, 40))
      k <- Gen.choose(1, 12)
    } yield (sizes, k)
    for (((sizes, k), idx) <- samples(caseGen, 12).zipWithIndex) {
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (sz, g) =>
        (0 until sz).map { _ => id += 1; (s"g$g", id) }
      }
      if (rows.nonEmpty) {
        val got = Caps.capPerGroup(rows.toDF("grp", "id"), Seq("grp"), "id", k)
          .groupBy("grp").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        sizes.zipWithIndex.foreach { case (sz, g) =>
          assert(got.getOrElse(s"g$g", 0L) === math.min(sz, k).toLong,
            s"case=$idx grp=g$g size=$sz k=$k")
        }
      }
    }
  }

  test("madOutliers law: flags are invariant under a constant value shift") {
    import spark.implicits._
    val caseGen = Gen.listOfN(25, Gen.choose(-10000, 10000))
    for ((cents, idx) <- samples(caseGen, 10).zipWithIndex) {
      val base = cents.zipWithIndex.map { case (c, i) => (i.toLong, c / 100.0) }
      def flags(shift: Double): Map[Long, Long] =
        Stats.madOutliers(base.map { case (i, v) => (i, v + shift) }
          .toDF("id", "v").withColumn("g", lit("x")), "g", "v")
          .select("id", "flagged").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // median and MAD are shift-equivariant/invariant, so the flag set
      // must not move when every value shifts by the same whole cents
      assert(flags(0.0) === flags(137.00), s"case=$idx")
    }
  }

  test("percentRankCalibrate laws: range, monotone in value, partitioning-invariant") {
    import spark.implicits._
    val caseGen = Gen.listOfN(40, Gen.choose(0L, 30L))
    for ((vals, idx) <- samples(caseGen, 10).zipWithIndex) {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
        .withColumn("g", lit("s"))
      val out = Stats.percentRankCalibrate(df, "g", "v")
        .select("id", "v", "pr_x1e4").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.foreach { case (_, _, pr) => assert(pr >= 0L && pr <= 10000L, s"case=$idx") }
      // equal values share a rank; larger values have strictly larger pr
      val byV = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
      byV.values.foreach(s => assert(s.size === 1, s"case=$idx ties must share"))
      val sorted = byV.toSeq.sortBy(_._1).map(_._2.head)
      assert(sorted === sorted.sorted, s"case=$idx monotone")
      // repartitioning must not change a single rank
      val re = Stats.percentRankCalibrate(df.repartition(7), "g", "v")
        .select("id", "pr_x1e4").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.map(t => t._1 -> t._3).toMap === re, s"case=$idx")
    }
  }

  test("fleissStats law: invariant under any label renaming (bijection)") {
    import spark.implicits._
    val caseGen = Gen.listOfN(20, Gen.choose(0, 2))
    for ((picks, idx) <- samples(caseGen, 10).zipWithIndex) {
      // 10 items x 2 raters; rater 2's label drawn from the generator
      val votes = picks.take(10).zipWithIndex.flatMap { case (p, i) =>
        Seq((i.toLong, "l0"), (i.toLong, s"l$p"))
      }
      val rename = Map("l0" -> "zebra", "l1" -> "apple", "l2" -> "mango")
      def stats(vs: Seq[(Long, String)]): Seq[Long] = {
        val r = Labeling.fleissStats(vs.toDF("example_id", "label"),
          "example_id", "label", nRaters = 2).head()
        Seq("n_items", "s2_sum", "cj2_sum", "kappa_num", "kappa_den")
          .map(c => r.getLong(r.fieldIndex(c)))
      }
      assert(stats(votes) === stats(votes.map { case (i, l) => (i, rename(l)) }),
        s"case=$idx")
    }
  }

  test("blocklistHits law: additive under whitespace concatenation") {
    import spark.implicits._
    val word = Gen.oneOf("bad", "ok", "fine", "bad.", "BAD", "badge")
    val docGen = Gen.listOfN(6, word).map(_.mkString(" "))
    for ((pair, idx) <- samples(Gen.zip(docGen, docGen), 15).zipWithIndex) {
      val (a, b) = pair
      val df = Seq((1L, a), (2L, b), (3L, s"$a $b")).toDF("doc_id", "text")
      val h = df.select(col("doc_id"),
        TextAnalysis.blocklistHits(col("text"), Seq("bad")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(h(3L) === h(1L) + h(2L), s"case=$idx a='$a' b='$b'")
    }
  }

  test("contaminationRatio law: scores live in [0, 10000]; benchmark members score 10000") {
    import spark.implicits._
    val docGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    for ((texts, idx) <- samples(Gen.listOfN(6, docGen), 6).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val bench = docs.where(col("doc_id") === 0).select(col("text"))
      val out = Decontamination.contaminationRatio(docs, "doc_id", "text", bench, "text", n = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      out.values.foreach(v => assert(v >= 0L && v <= 10000L, s"case=$idx"))
      assert(out(0L) === 10000L, s"case=$idx the benchmark member itself")
    }
  }
}
