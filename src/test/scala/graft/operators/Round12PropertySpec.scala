package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** Property laws for the round-12 additions (AC phrase matching, accent
  * folding, CMS/HLL sketches, FS linkage). Raw ScalaCheck generators with
  * fixed seeds (scalatestplus isn't on the offline classpath); kernels are
  * exercised directly where the law is per-row, through Spark plans where
  * it is distributional. */
class Round12PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def samples[A](g: Gen[A], n: Int = 30): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0xC12L + i)))

  // ---- Aho–Corasick vs a naive token-sequence reference matcher ----

  private def tokenize(s: String): Array[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def naiveHits(text: String, phrases: Seq[String]): Long = {
    val toks = tokenize(text)
    phrases.map(tokenize(_).toSeq).filter(_.nonEmpty).map { p =>
      (0 to toks.length - p.length).count(i => toks.slice(i, i + p.length).toSeq == p).toLong
    }.sum
  }

  test("phrase-hit law: automaton count equals the naive position scan") {
    val word = Gen.oneOf("aa", "b", "cat", "dog", "x1", "longword")
    val caseGen = for {
      nText <- Gen.choose(0, 40)
      textWords <- Gen.listOfN(nText, word)
      sep <- Gen.listOfN(math.max(nText - 1, 0) + 2, Gen.oneOf(" ", ", ", "  ", "-", "\n"))
      nP <- Gen.choose(1, 6)
      phrases <- Gen.listOfN(nP, for {
        k <- Gen.choose(1, 3); ws <- Gen.listOfN(k, word)
      } yield ws.mkString(" "))
    } yield {
      val sb = new StringBuilder(sep.head)
      textWords.zipWithIndex.foreach { case (w, i) => sb.append(w).append(sep(i + 1)) }
      (sb.toString, phrases.distinct)
    }
    for (((text, phrases), idx) <- samples(caseGen, 40).zipWithIndex) {
      val got = PhraseMatch.automaton(phrases).countHits(UTF8String.fromString(text))
      assert(got === naiveHits(text, phrases), s"case=$idx text='$text' phrases=$phrases")
    }
  }

  // ---- Accent folding laws ----

  test("fold law: idempotent, and equal to folding the NFC or NFD form") {
    val ch = Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ü', 'ß', 'ø', 'å', 'ñ', '中', ' '),
      Gen.oneOf('\u0301', '\u0300', '\u0308', '\u0323')) // bare combining marks
    val caseGen = Gen.listOfN(24, ch).map(_.mkString)
    def fold(s: String): String =
      UnicodeFold.foldAccentsUTF8(UTF8String.fromString(s)).toString
    for ((s, idx) <- samples(caseGen, 40).zipWithIndex) {
      val f = fold(s)
      assert(fold(f) === f, s"case=$idx not idempotent on '$s'")
      val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      assert(fold(nfc) === f && fold(nfd) === f,
        s"case=$idx fold not normalization-invariant on '$s'")
    }
  }

  test("fold law: output never contains a non-spacing mark") {
    val caseGen = Gen.listOfN(16, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'å', '\u0301', '\u0323'))).map(_.mkString)
    def fold(s: String): String =
      UnicodeFold.foldAccentsUTF8(UTF8String.fromString(s)).toString
    for (s <- samples(caseGen, 30)) {
      assert(fold(s).codePoints().toArray.forall(cp =>
        Character.getType(cp) != Character.NON_SPACING_MARK))
    }
  }

  // ---- Sketch laws (through real Spark plans) ----

  test("CMS law: estimate >= exact count for every key in a random multiset") {
    import spark.implicits._
    val caseGen = Gen.listOfN(120, Gen.choose(0, 25).map(i => s"k$i"))
    for ((keys, idx) <- samples(caseGen, 6).zipWithIndex) {
      val df = keys.toDF("k")
      val cells = Sketches.cmsAggregate(df, "k", depth = 4, width = 16)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = Sketches.cmsEstimates(cells, exact.keys.toSeq.toDF("k"), "k",
          depth = 4, width = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"case=$idx key=$k exact=$n est=${est(k)} (width 16 forces collisions)")
      }
    }
  }

  test("HLL law: registers of a union are the elementwise max (mergeability)") {
    import spark.implicits._
    val caseGen = for {
      a <- Gen.listOfN(80, Gen.choose(0, 5000).map(i => s"a$i"))
      b <- Gen.listOfN(80, Gen.choose(0, 5000).map(i => s"b$i"))
    } yield (a, b)
    def regs(keys: Seq[String]): Map[Long, Long] =
      Sketches.hllRegisters(keys.toDF("k"), "k", m = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (((a, b), idx) <- samples(caseGen, 5).zipWithIndex) {
      val (ra, rb, ru) = (regs(a), regs(b), regs(a ++ b))
      val merged = (ra.keySet ++ rb.keySet).map(k =>
        k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
      assert(ru === merged, s"case=$idx")
    }
  }

  // ---- FS linkage law ----

  test("FS law: score is monotone — flipping any field to agreement never lowers it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val caseGen = for {
      nat <- Gen.choose(0, 3); seg <- Gen.oneOf("A", "B")
      balDiff <- Gen.choose(0L, 300L)
    } yield (nat, seg, balDiff)
    val rules = Seq(
      RecordLinkage.FieldRule("nat", (a, b) => a === b, 6L, -6L),
      RecordLinkage.FieldRule("seg", (a, b) => a === b, 4L, -4L),
      RecordLinkage.FieldRule("bal", (a, b) => abs(a - b) <= 100L, 10L, -10L))
    def score(nat2: Int, seg2: String, bal2: Long): Long = {
      val df = Seq((1L, "k1", 1, "A", 0L), (2L, "k2", nat2, seg2, bal2))
        .toDF("id", "key", "nat", "seg", "bal")
      RecordLinkage.fsScores(df, "id", Seq(col("key")), rules,
          window = 2, blockLen = 1)
        .collect().head.getLong(3)
    }
    for (((nat, seg, bal), idx) <- samples(caseGen, 8).zipWithIndex) {
      val base = score(nat, seg, bal)
      assert(score(1, seg, bal) >= base, s"case=$idx nat-flip lowered the score")
      assert(score(nat, "A", bal) >= base, s"case=$idx seg-flip lowered the score")
      assert(score(nat, seg, 0L) >= base, s"case=$idx bal-flip lowered the score")
    }
  }
}
