package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SegmentSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def segment(vocab: Seq[String], texts: (Long, String)*): Map[Long, Seq[String]] = {
    import spark.implicits._
    Segment.viterbiSegment(texts.toDF("doc_id", "text"), "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
  }

  /** Scalar DP with the same objective and tie rule. */
  private def scalarViterbi(word: String, vocab: Set[String]): Option[Seq[String]] = {
    val n = word.length
    val INF = 1 << 20
    // best(j) = (cost, lastLen), tie -> longer last token
    val best = Array.fill(n + 1)((INF, 0))
    best(0) = (0, 0)
    for (j <- 1 to n; l <- 1 to j) {
      val tok = word.substring(j - l, j)
      val prev = best(j - l)._1
      if (vocab(tok) && prev < INF) {
        val c = prev + 1
        if (c < best(j)._1 || (c == best(j)._1 && l > best(j)._2)) best(j) = (c, l)
      }
    }
    if (best(n)._1 >= INF) None
    else {
      var j = n; val out = scala.collection.mutable.ListBuffer.empty[String]
      while (j > 0) { val l = best(j)._2; out.prepend(word.substring(j - l, j)); j -= l }
      Some(out.toSeq)
    }
  }

  test("matches the scalar DP, including the longest-last-token tie rule") {
    val vocab = Seq("a", "b", "c", "ab", "bc", "abc", "cab")
    val words = Seq("abcabc", "cababc", "bcbcab", "aaabbb", "abcbca")
    val got = segment(vocab, words.zipWithIndex.map { case (w, i) => (i.toLong, w) }: _*)
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) === scalarViterbi(w, vocab.toSet).get, w)
    }
  }

  test("optimality: never more tokens than greedy BPE on the same implied vocab") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat with another cat"),
      (2L, "that hat mattered rather more than the matter at hand"),
      (3L, "a tattered banner at the theatre"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", k = 10)
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val chars = docs.select(explode(org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.col("text")), "")).as("c"))
      .where(org.apache.spark.sql.functions.col("c").rlike("^[a-z]$"))
      .distinct().collect().map(_.getString(0)).toSeq
    val vocab = chars ++ merges.map { case (a, b) => a + b }
    val viterbi = Segment.viterbiSegment(docs, "doc_id", "text", vocab)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val greedy = Bpe.encode(docs, "doc_id", "text", merges)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    greedy.foreach { case (id, g) =>
      assert(viterbi(id) <= g, s"doc $id: viterbi ${viterbi(id)} > greedy $g")
    }
    assert(viterbi.keySet === greedy.keySet)
  }

  test("words with out-of-vocab characters or over the length cap are dropped") {
    val vocab = Seq("a", "b", "ab")
    val got = segment(vocab, 1L -> ("ab ba zz " + "a" * 25))
    // "zz" has no 'z' in vocab; the 25-char word exceeds maxWordLen=20;
    // positions stay contiguous over what remains
    assert(got(1L) === Seq("ab", "b", "a"))
  }

  test("segmentation is a zero-shuffle narrow projection") {
    import spark.implicits._
    val docs = Seq((1L, "ab ba abab")).toDF("doc_id", "text")
    val plan = Segment.viterbiSegment(docs, "doc_id", "text", Seq("a", "b", "ab"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("empty result for a doc with no segmentable words") {
    val vocab = Seq("x")
    val got = segment(vocab, 1L -> "yy zz", 2L -> "x")
    assert(!got.contains(1L) && got(2L) === Seq("x"))
  }

  test("unicode alphabet segments accented words; ascii alphabet drops them") {
    import spark.implicits._
    val docs = Seq((1L, "straße über cafe")).toDF("doc_id", "text")
    val uniVocab = Seq("s", "t", "r", "a", "ß", "e", "ü", "b", "c", "f", "straße", "üb")
    val uni = Segment.viterbiSegment(docs, "doc_id", "text", uniVocab,
        wordPattern = Bpe.UnicodeWords)
      .collect().map(r => (r.getLong(1), r.getString(2))).sortBy(_._1).map(_._2)
    assert(uni.toSeq === Seq("straße", "üb", "e", "r", "c", "a", "f", "e"))
    // the default ascii alphabet sees only "cafe" (documented contract)
    val ascii = Segment.viterbiSegment(docs, "doc_id", "text",
        Seq("c", "a", "f", "e"))
      .collect().map(_.getString(2))
    assert(ascii.toSeq === Seq("c", "a", "f", "e"))
  }

  test("vocabulary tokens outside the word alphabet fail loudly") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Segment.viterbiSegment(docs, "doc_id", "text", Seq("a", "b", "Über"))
    }
    assert(ex.getMessage.contains("Über"))
  }

  private def explode(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.explode(c)
}
