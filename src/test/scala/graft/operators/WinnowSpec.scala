package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WinnowSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val K = 5
  private val W = 4

  /** Independent reference: per-window FULL scan with the rightmost-min
    * rule (the kernel uses an incremental update — agreement here checks
    * that optimization against the paper's definition). */
  private def refFingerprints(text: String, k: Int = K, w: Int = W): Seq[Long] = {
    val t = text.trim.toLowerCase
    val cps = t.codePoints().toArray
    val n = cps.length - k + 1
    if (n < 1) return Nil
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = (0 until n).map { i =>
      val dig = md.digest(new String(cps, i, k).getBytes("UTF-8"))
      var v = 0L
      (0 until 8).foreach(b => v = (v << 8) | (dig(b) & 0xffL))
      v >>> 4
    }
    val wEff = math.min(w, n)
    val sel = (0 to n - wEff).map { j =>
      var best = j
      ((j + 1) until (j + wEff)).foreach(p => if (h(p) <= h(best)) best = p)
      h(best)
    }
    sel.distinct
  }

  private def opFingerprints(texts: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    Winnow.fingerprints(texts.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
  }

  test("structurally identical winnow expressions are semantically equal (CSE-able)") {
    // advisor r12: the expression used to carry the kernel INSTANCE as a
    // case-class field compared by reference, so two identical winnow
    // columns never canonicalized together — defeating common-subexpression
    // elimination. Parameterized on (k, w), equality is value-based.
    val child = org.apache.spark.sql.GraftBridge.expression(lower(lit("abcdef")))
    val a = graft.plans.WinnowFingerprintsExpr(child, K, W)
    val b = graft.plans.WinnowFingerprintsExpr(child, K, W)
    assert(a == b, "same (child, k, w) must be equal")
    assert(a.semanticEquals(b), "canonicalized forms must match")
    assert(a != graft.plans.WinnowFingerprintsExpr(child, K, W + 1),
      "different window must not compare equal")
  }

  test("kernel matches the per-window-rescan reference on random strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde " // small alphabet forces hash ties (rightmost rule exercised)
    val texts = (1L to 40L).map(i =>
      i -> (0 until (5 + rnd.nextInt(120))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = opFingerprints(texts)
    texts.foreach { case (id, t) =>
      val ref = refFingerprints(t).sorted
      if (ref.isEmpty) assert(!got.contains(id))
      else assert(got(id) === ref, s"doc $id text '$t'")
    }
  }

  test("winnowing guarantee: a shared substring of length >= k+w-1 shares a fingerprint") {
    val rnd = new scala.util.Random(13)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randStr(K + W - 1) // the guarantee threshold t = k + w - 1
    (1 to 20).foreach { _ =>
      val a = randStr(30) + shared + randStr(30)
      val b = randStr(25) + shared + randStr(35)
      val fa = refFingerprints(a).toSet
      val fb = refFingerprints(b).toSet
      assert(fa.intersect(fb).nonEmpty, s"guarantee violated for shared '$shared'")
    }
    // and the kernel agrees with the reference on exactly those docs
    val docs = Seq(1L -> (randStr(30) + shared + randStr(30)))
    assert(opFingerprints(docs)(1L) === refFingerprints(docs.head._2).sorted)
  }

  test("density: ~2/(w+1) of grams selected, never more than gram count") {
    val rnd = new scala.util.Random(21)
    val t = (0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val fps = refFingerprints(t)
    val n = t.length - K + 1
    assert(fps.size <= n)
    // expected density 2/(w+1) = 0.4; allow generous slack, but the set
    // must be a real sample, not everything
    assert(fps.size < n * 0.6, s"density ${fps.size.toDouble / n} too high")
    assert(fps.size > n * 0.2, s"density ${fps.size.toDouble / n} too low")
  }

  test("short/null/empty texts yield no fingerprints, not errors") {
    import spark.implicits._
    val df = Seq((1L, "abcd"), (2L, ""), (3L, "    "), (5L, "abcde"))
      .toDF("doc_id", "text")
      .unionByName(Seq((4L, Option.empty[String])).toDF("doc_id", "text"))
    val got = Winnow.fingerprints(df, "doc_id", "text", K, W)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(got === Set(5L)) // only the doc with >= k chars survives
  }

  test("pairs: exact copies reach sim 1.0; disjoint docs never pair; hot fingerprints capped") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val a = randStr(200)
    val b = randStr(200)
    val boiler = randStr(60) // shared boilerplate across many docs
    val rows = Seq(1L -> a, 2L -> a, 3L -> b) ++ (10L to 29L).map(i => i -> (boiler + randStr(3)))
    val df = rows.toDF("doc_id", "text")
    val got = Winnow.pairs(df, "doc_id", "text", K, W, threshold = 0.99, maxDf = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 === 1.0))
    assert(!got.exists(p => p._2 == 3L || p._1 == 3L))
    // without a cap the 20-doc boilerplate family pairs WHOLESALE on the
    // shared 60-char prefix (~C(20,2) pairs); with maxDf = 2 those
    // fingerprints are dropped and only incidental rare-tail overlaps can
    // remain (sizes are post-cap, so a stray shared suffix gram may still
    // clear Jaccard — the guarantee is no wholesale blow-up, not zero)
    def familyPairs(cap: Long) =
      Winnow.pairs(df, "doc_id", "text", K, W, threshold = 0.5, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .count(p => p._1 >= 10L && p._1 <= 29L)
    val uncapped = familyPairs(1000L)
    val cappedFamily = familyPairs(2L)
    assert(uncapped > 150, s"boilerplate family should pair wholesale uncapped, got $uncapped")
    assert(cappedFamily < uncapped / 10,
      s"cap must break the boilerplate blow-up: $cappedFamily vs $uncapped")
    // the exact-copy pair rides its own df=2 fingerprints and survives
    val capped = Winnow.pairs(df, "doc_id", "text", K, W, threshold = 0.5, maxDf = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.contains((1L, 2L)))
  }

  test("unicode texts gram by codepoint (é counts as one character)") {
    // 'é' (U+00E9) is 2 UTF-8 bytes / 1 codepoint: a UTF-16-code-unit or
    // byte-based gram would shift every window after it
    val t = "caféxyz caféxyz padpadpad"
    assert(refFingerprints(t).nonEmpty)
    assert(opFingerprints(Seq(1L -> t))(1L) === refFingerprints(t).sorted)
  }
}
