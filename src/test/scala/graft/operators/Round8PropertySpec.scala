package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property laws for the round-8 operators (chunking, splits, pair
  * expansion, normalization). Raw ScalaCheck generators with fixed seeds
  * (scalatestplus isn't on the offline classpath), evaluated through real
  * Spark plans in one batched pass per law. */
class Round8PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0x8EEDL + i)))

  test("chunking laws: total coverage, order, seam overlap, bounded sizes") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(1, 120)
      size <- Gen.choose(2, 40)
      ov <- Gen.choose(0, size - 1)
    } yield (n, size, ov)
    for (((n, size, ov), idx) <- samples(caseGen, 30).zipWithIndex) {
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val got = Chunking.tokenChunks(
        Seq((idx.toLong, text)).toDF("doc_id", "text"), "doc_id", "text", size, ov)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getLong(1), r.getString(3).split(" ").toSeq))
      val stride = size - ov
      // indices are 0..k-1 dense
      assert(got.map(_._1).toSeq === got.indices.map(_.toLong), s"n=$n size=$size ov=$ov")
      // chunk c covers tokens [c*stride+1, min(c*stride+size, n)] in order
      got.foreach { case (c, toks) =>
        val start = c.toInt * stride + 1
        val expect = (start until math.min(start + size, n + 1)).map(i => s"w$i")
        assert(toks === expect, s"n=$n size=$size ov=$ov chunk=$c")
      }
      // total coverage, every chunk adds >=1 new token, non-final are full
      assert(got.flatMap(_._2).toSet.size === n)
      got.dropRight(1).foreach { case (_, toks) => assert(toks.size === size) }
      assert(got.last._2.nonEmpty)
    }
  }

  test("pair expansion equals the naive enumeration for random bucket arrays") {
    import spark.implicits._
    val arrGen = Gen.listOfN(12, Gen.choose(0L, 9L)) // duplicates likely
    val arrays = samples(arrGen, 40)
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("row_id", "ids")
    val got = df.select(col("row_id"), array_sort(array_distinct(col("ids"))).as("s"))
      .select(col("row_id"), Pairs.fromSortedLongs(col("s")).as("p"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))).toSet).toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val s = a.distinct.sorted
      val naive = (for (x <- s.indices; y <- x + 1 until s.size) yield (s(x), s(y))).toSet
      assert(got(i.toLong) === naive, s"array $a")
    }
  }

  test("normalize laws: idempotent, no doubled spaces, trimmed, lossless on clean text") {
    import spark.implicits._
    val junkGen = Gen.listOfN(10, Gen.oneOf(
      "Word", "UPPER", "miXed", "\t", "\n", "\u0007", "  ", "a,b", "x!y", "1.2", "")).map(_.mkString(" "))
    val texts = samples(junkGen).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = df.select(
      TextAnalysis.normalize(col("text")).as("once"),
      TextAnalysis.normalize(TextAnalysis.normalize(col("text"))).as("twice"),
      TextAnalysis.normalize(col("text"), stripPunct = true).as("np"))
      .collect()
    out.foreach { r =>
      val (once, twice, np) = (r.getString(0), r.getString(1), r.getString(2))
      assert(once === twice, "idempotence")
      for (v <- Seq(once, np)) {
        assert(!v.contains("  "), s"doubled space in '$v'")
        assert(v === v.trim, s"untrimmed '$v'")
        assert(!v.exists(c => c < ' ' || c == '\u007f'), s"control char in '$v'")
      }
      assert(np.forall(c => c.isLetterOrDigit || c == ' '), s"punct survived in '$np'")
    }
  }

  test("cluster-stable splits: any pair graph, members of one component share a split") {
    import spark.implicits._
    val pairsGen = for {
      k <- Gen.choose(1, 10)
      ps <- Gen.listOfN(k, for {
        a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield ps.distinct
    val docs = (0L until 40L).map(i => (i, "d")).toDF("doc_id", "text")
    for ((ps, i) <- samples(pairsGen, 12).zipWithIndex if ps.nonEmpty) {
      val out = Splits.clusterStableSplit(docs, "doc_id", ps.toDF("id_a", "id_b"),
        Seq(("train", 8000), ("val", 1000), ("test", 1000)))
        .select(col("doc_id"), col("split")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // transitive closure by union-find on the generated pairs
      val parent = scala.collection.mutable.Map((0L until 40L).map(x => x -> x): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      ps.foreach { case (a, b) => parent(find(a)) = find(b) }
      (0L until 40L).groupBy(find).values.foreach { members =>
        assert(members.map(out).toSet.size === 1, s"pairs=$ps split cluster $members")
      }
    }
  }

  test("qualityDecision law: Spark plan agrees with an independent Scala reference") {
    import spark.implicits._
    // word soup over a mixed alphabet: stopwords, short fillers, long rares
    val wordGen = Gen.frequency(
      3 -> Gen.oneOf("the", "a", "of", "and", "to", "in", "is"),
      4 -> Gen.oneOf("key", "row", "scan", "fast", "table", "value"),
      2 -> Gen.oneOf("supercalifragilistic", "antidisestablishment"),
      1 -> Gen.const("x"))
    val docGen = for {
      n <- Gen.choose(1, 120)
      ws <- Gen.listOfN(n, wordGen)
      dupLine <- Gen.choose(0, 5)
    } yield (ws.mkString(" ") + ("\nrepeat line" * dupLine))
    val docs = samples(docGen, 60).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = TextAnalysis.qualityDecision(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("reasons"), r.getAs[Long]("keep"))).toMap
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    for ((id, text) <- docs) {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val n = toks.size.toLong
      val chars = toks.map(_.length.toLong).sum
      val nStop = toks.count(stop).toLong
      val lines = text.split("\n", -1).toSeq
      val dup = (lines.size - lines.distinct.size).toLong
      val reasons = (if (n < 30) 1L else 0L) +
        (if (chars * 10 < n * 30 || chars * 10 > n * 100) 2L else 0L) +
        (if (nStop * 1000 < n * 20) 4L else 0L) +
        (if (dup * 1000 > lines.size * 300) 8L else 0L)
      assert(got(id) === ((n, reasons, if (reasons == 0) 1L else 0L)),
        s"doc $id: ${text.take(80)}")
    }
  }
}
