package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def corpus(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private val train = corpus(Seq(
    (0L, "gato perro casa sol luna gato", "es"),
    (2L, "gato sol casa perro perro", "es"),
    (4L, "cat dog house sun moon cat", "en"),
    (6L, "dog sun house cat cat", "en"),
    (8L, "cat dog sun", "en")))

  test("separable corpus classifies perfectly") {
    val test = corpus(Seq(
      (1L, "gato casa luna", "es"),
      (3L, "perro sol gato", "es"),
      (5L, "cat house moon", "en"),
      (7L, "dog sun cat", "en")))
    val (cnt, dc) = Classifier.trainNb(train, "text", "lang", nBuckets = 256)
    val preds = Classifier.predictNb(
        Classifier.scoreNb(test, "doc_id", "text", cnt, dc, nBuckets = 256))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds === Map(1L -> "es", 3L -> "es", 5L -> "en", 7L -> "en"))
  }

  test("model is additive: shard counts sum to the whole-corpus model") {
    val h0 = train.where(col("doc_id") % 4 === 0)
    val h1 = train.where(col("doc_id") % 4 =!= 0)
    val (c0, d0) = Classifier.trainNb(h0, "text", "lang", nBuckets = 256)
    val (c1, d1) = Classifier.trainNb(h1, "text", "lang", nBuckets = 256)
    val mergedC = c0.unionByName(c1)
      .groupBy(col("label"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val (cw, dw) = Classifier.trainNb(train, "text", "lang", nBuckets = 256)
    val cMismatch = mergedC.as("m").join(cw.as("w"), Seq("label", "bucket"), "full_outer")
      .where(!(col("m.cnt") <=> col("w.cnt"))).count()
    assert(cMismatch === 0L)
    val mergedD = d0.unionByName(d1)
      .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs"))
    val dMismatch = mergedD.as("m").join(dw.as("w"), Seq("label"), "full_outer")
      .where(!(col("m.n_docs") <=> col("w.n_docs"))).count()
    assert(dMismatch === 0L)
  }

  test("unseen tokens fall back to the prior; prior tie breaks by label") {
    // 'en' has 3 training docs, 'es' 2 -> prior favors en for alien text
    val test = corpus(Seq((9L, "zzz qqq www", "??")))
    val (cnt, dc) = Classifier.trainNb(train, "text", "lang", nBuckets = 256)
    val pred = Classifier.predictNb(
        Classifier.scoreNb(test, "doc_id", "text", cnt, dc, nBuckets = 256))
      .collect()(0).getString(1)
    assert(pred === "en")
  }

  test("null text and null labels are excluded from training; null text from scoring") {
    val dirty = corpus(Seq(
      (0L, "cat dog", "en"), (1L, null, "en"), (2L, "gato", null)))
    val (cnt, dc) = Classifier.trainNb(dirty, "text", "lang", nBuckets = 256)
    assert(dc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap === Map("en" -> 1L))
    val scored = Classifier.scoreNb(dirty, "doc_id", "text", cnt, dc, nBuckets = 256)
    assert(scored.where(col("doc_id") === 1L).count() === 0L)
  }

  test("nBuckets must divide 4096") {
    intercept[IllegalArgumentException] {
      Classifier.trainNb(train, "text", "lang", nBuckets = 300)
    }
  }

  test("in-row literal-model predictions equal the batch scorer row-for-row") {
    val test = corpus(Seq(
      (1L, "gato casa luna", "es"), (3L, "perro sol gato", "es"),
      (5L, "cat house moon", "en"), (7L, "dog sun cat", "en"),
      (9L, "zzz unseen tokens", "??"), (11L, "", "??")))
    val (cnt, dc) = Classifier.trainNb(train, "text", "lang", nBuckets = 256)
    val batch = Classifier.predictNb(
        Classifier.scoreNb(test, "doc_id", "text", cnt, dc, nBuckets = 256))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val model = Classifier.collectModel(cnt, dc, nBuckets = 256)
    val inRow = Classifier.predictNbInRow(test, "doc_id", "text", model, nBuckets = 256)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(inRow === batch)
  }

  test("in-row == batch holds under heavy token repetition (association law)") {
    // advisor r15 #3: the old in-row path accumulated lnp token-by-token,
    // so a doc repeating one token n times summed lnp n times where the
    // batch path computes ONE n*lnp product — IEEE-divergent multisets
    // that can flip a floor(x*1e4) boundary. The run-length rewrite makes
    // both paths sum the same tfb*lnp terms; repetition-heavy docs are
    // exactly the class that exposed the difference.
    val test = corpus((1L to 40L).map { i =>
      val words = Seq.fill((i % 7).toInt + 1)("gato") ++
        Seq.fill((i % 5).toInt + 1)("cat") ++ Seq.fill(13)("luna")
      (i, words.mkString(" "), "?")
    })
    val (cnt, dc) = Classifier.trainNb(train, "text", "lang", nBuckets = 256)
    val batch = Classifier.predictNb(
        Classifier.scoreNb(test, "doc_id", "text", cnt, dc, nBuckets = 256))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val model = Classifier.collectModel(cnt, dc, nBuckets = 256)
    val inRow = Classifier.predictNbInRow(test, "doc_id", "text", model, nBuckets = 256)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(inRow === batch)
  }

  test("scores are on the x1e4 grid and every test doc gets every label") {
    val test = corpus(Seq((1L, "gato casa", "es"), (5L, "cat house", "en")))
    val (cnt, dc) = Classifier.trainNb(train, "text", "lang", nBuckets = 256)
    val scored = Classifier.scoreNb(test, "doc_id", "text", cnt, dc, nBuckets = 256)
    assert(scored.count() === 4L) // 2 docs x 2 labels
    assert(scored.schema("score_x1e4").dataType.typeName === "long")
  }
}
