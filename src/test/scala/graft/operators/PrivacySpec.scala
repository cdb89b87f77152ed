package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PrivacySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("anonymityReport computes class size, l-diversity, and pass flags") {
    import spark.implicits._
    // class (1,a): 3 rows, 3 distinct sensitive; class (1,b): 2 rows, 1 distinct
    val df = Seq(
      (1, "a", 100), (1, "a", 200), (1, "a", 300),
      (1, "b", 500), (1, "b", 500)).toDF("q1", "q2", "s")
    val out = Privacy.anonymityReport(df, Seq("q1", "q2"), "s", k = 3, l = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      (1, "a", 3L, 3L, 1L, 1L),   // k=3 ok, l=3 >= 2 ok
      (1, "b", 2L, 1L, 0L, 0L)))  // size 2 < 3, l-div 1 < 2
  }

  test("bucketFloor floors toward -infinity for negative values (pmod)") {
    import spark.implicits._
    val df = Seq(-150L, -100L, -1L, 0L, 99L, 100L).toDF("v")
    val out = df.select(Privacy.bucketFloor(org.apache.spark.sql.functions.col("v"), 100L))
      .collect().map(_.getLong(0))
    // plain v/width*width would send -1 to 0, merging the buckets around 0
    assert(out.toSeq === Seq(-200L, -100L, -100L, 0L, 0L, 100L))
  }

  test("generalizationLadder marks the minimal width reaching k") {
    import spark.implicits._
    // 12 rows, one categorical class; values 0..11 -> width 1: every class
    // size 1 (fails k=3); width 4: classes {0..3},{4..7},{8..11} of size 4
    // (passes); width 100: one class of 12 (also passes, but NOT minimal)
    val df = (0L until 12L).map(v => ("x", v)).toDF("cat", "v")
    val out = Privacy.generalizationLadder(df, "v", Seq(1L, 4L, 100L), Seq("cat"), k = 3)
      .orderBy("width")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 12L, 1L, 12L, 0L),
      (4L, 3L, 4L, 0L, 1L),
      (100L, 1L, 12L, 0L, 0L)))
  }

  test("generalizationLadder: no level satisfying k -> no row chosen") {
    import spark.implicits._
    val df = Seq(("x", 1L), ("y", 2L)).toDF("cat", "v") // classes of 1 forever
    val out = Privacy.generalizationLadder(df, "v", Seq(10L, 100L), Seq("cat"), k = 5)
      .collect().map(r => r.getLong(4))
    assert(out.forall(_ === 0L))
  }

  test("tCloseness: class matching the global distribution scores 0; disjoint support is maximal") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // global: a:4, b:4 over 8 rows. class g1 = {a,a,b,b} mirrors it exactly;
    // class g2 = {a,a,b,b} too -> both t=0
    val mirror = Seq(("g1","a"),("g1","a"),("g1","b"),("g1","b"),
      ("g2","a"),("g2","a"),("g2","b"),("g2","b")).toDF("q","v")
    val t0 = Privacy.tClosenessReport(mirror, Seq("q"), "v", tPpm = 0L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(t0 === Map("g1" -> (0L, 1L), "g2" -> (0L, 1L)))
    // disjoint supports: g1 all 'a', g2 all 'b' (4 rows each, global a:4 b:4)
    // TVD(g1) = max(4*8 - 4*4, 0)/(4*8) = 16/32 = 0.5 -> 500000 ppm
    val split = Seq(("g1","a"),("g1","a"),("g1","a"),("g1","a"),
      ("g2","b"),("g2","b"),("g2","b"),("g2","b")).toDF("q","v")
    val t1 = Privacy.tClosenessReport(split, Seq("q"), "v", tPpm = 200000L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(t1 === Map("g1" -> (500000L, 0L), "g2" -> (500000L, 0L)))
  }

  test("tCloseness: hand-computed skewed class on the exact ppm grid") {
    import spark.implicits._
    // global over 6 rows: a:3, b:2, c:1. class g1 = {a,a,a} (n_c=3):
    // pos(a) = max(3*6 - 3*3, 0) = 9; b,c absent contribute 0
    // t = 9 / (3*6) = 0.5 -> 500000. class g2 = {b,b,c} (n_c=3):
    // pos(b) = max(2*6 - 2*3, 0) = 6; pos(c) = max(1*6 - 1*3, 0) = 3
    // t = 9/18 = 0.5 -> 500000
    val df = Seq(("g1","a"),("g1","a"),("g1","a"),
      ("g2","b"),("g2","b"),("g2","c")).toDF("q","v")
    val out = Privacy.tClosenessReport(df, Seq("q"), "v", tPpm = 500000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(("g1", 3L, 500000L, 1L), ("g2", 3L, 500000L, 1L)))
  }

  test("tCloseness: NULL quasi values form their own class (not dropped)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Some("g1"),"a"),(Some("g1"),"b"),(None,"a"),(None,"b"))
      .toDF("q","v")
    val out = Privacy.tClosenessReport(df, Seq("q"), "v", tPpm = 1000000L)
    assert(out.count() === 2L)
    assert(out.where(col("q").isNull).count() === 1L)
  }

  test("tCloseness: NULL sensitive values are a distinct value, not a leak") {
    import spark.implicits._
    // global over 4 rows: a:2, NULL:2. g1 = {a,a}, g2 = {NULL,NULL}.
    // pos_{g1}(a) = max(2*4 - 2*2, 0) = 4 -> t = 4/(2*4) = 0.5
    // pos_{g2}(NULL) = same by symmetry -> 500000 ppm for BOTH classes.
    // Pre-fix (advisor r15 #1) the equi-join dropped the NULL band: g2's
    // numerator was empty (t_ppm = 0 -> gate PASSED a class that is
    // maximally far from the global distribution) and g1 understated.
    val df = Seq(("g1", Some("a")), ("g1", Some("a")),
      ("g2", Option.empty[String]), ("g2", Option.empty[String])).toDF("q", "v")
    val out = Privacy.tClosenessReport(df, Seq("q"), "v", tPpm = 200000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(("g1", 2L, 500000L, 0L), ("g2", 2L, 500000L, 0L)))
  }

  test("dpNoisyCounts: deterministic per label, label-separated, bounded, count-shaped") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => ("g" + (i % 8).toString, i)).toDF("g", "id")
    val secret = "privacy-spec-secret-0123456789abcdef".getBytes
    def release(label: String) =
      Privacy.dpNoisyCounts(df, Seq("g"), label, secret)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = release("spec-a")
    assert(a === release("spec-a"), "same label => identical release")
    assert(a !== release("spec-b"), "different label => different draw")
    // true count is 500 per group; noise bounded by maxNoise = 40
    assert(a.values.forall(v => math.abs(v - 500L) <= 40L))
    // output column surface never includes the true count
    assert(Privacy.dpNoisyCounts(df, Seq("g"), "spec-c", secret).columns.toSeq === Seq("g", "n_noisy"))
  }

  test("dpNoiseCaseSql: exact thresholds and the 1/3 zero-mass law") {
    // F(-1) = 1/3, F(0) = 2/3 on the 2^60 grid
    val sql = Privacy.dpNoiseCaseSql("h", 40)
    assert(sql.contains("WHEN h < 384307168202282325 THEN -1"))
    assert(sql.contains("WHEN h < 768614336404564650 THEN 0"))
    // empirical: uniform h sweep hits noise 0 about 1/3 of the time and
    // stays within [-40, 40]
    import spark.implicits._
    val n = 100000L
    val step = (java.math.BigInteger.ONE.shiftLeft(60)
      .divide(java.math.BigInteger.valueOf(n))).longValueExact()
    val noise = spark.range(n).selectExpr(s"${Privacy.dpNoiseCaseSql(s"id * $step", 40)} AS x")
    val stats = noise.selectExpr(
      "count(CASE WHEN x = 0 THEN 1 END) AS zeros",
      "min(x) AS lo", "max(x) AS hi", "sum(x) AS s").collect()(0)
    assert(math.abs(stats.getLong(0) - n / 3) < n / 50)
    assert(stats.getAs[Number](1).longValue >= -40L && stats.getAs[Number](2).longValue <= 40L)
    assert(math.abs(stats.getAs[Number](3).longValue) < 3000L) // mean ~ 0
  }

  test("dpNoisySums: clamp sets sensitivity; noise rides the clip grid; deterministic") {
    import spark.implicits._
    // values WAY above the clip must not move the release more than the
    // clamp allows: group g0 holds outliers of 1e9, g1 holds zeros
    val df = (1L to 100L).map(i =>
      ("g" + (i % 2).toString, if (i % 2 == 0) 1000000000L else 0L)).toDF("g", "v")
    val secret = "privacy-spec-secret-0123456789abcdef".getBytes
    def release(label: String) =
      Privacy.dpNoisySums(df, Seq("g"), "v", clip = 10L, release = label, secret = secret)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = release("sum-a")
    assert(a === release("sum-a"))
    assert(a !== release("sum-b"))
    // clamped truth: g0 = 50 rows * 10 = 500, g1 = 0; noise in clip*[-40,40]
    assert(math.abs(a("g0") - 500L) <= 400L && a("g0") % 10 == 0)
    assert(math.abs(a("g1") - 0L) <= 400L && a("g1") % 10 == 0)
    // negative inputs clamp at 0, not -clip
    val neg = Seq(("g", -999L), ("g", 5L)).toDF("g", "v")
    val out = Privacy.dpNoisySums(neg, Seq("g"), "v", clip = 10L, release = "sum-c",
        secret = secret)
      .collect()(0).getLong(1)
    assert(math.abs(out - 5L) <= 400L && (out - 5L) % 10 == 0)
  }

  test("dp draws are secret-keyed: no replay without the secret; labels still separate") {
    import spark.implicits._
    val df = (1L to 800L).map(i => ("g" + (i % 4).toString, i)).toDF("g", "id")
    def release(secret: String, label: String) =
      Privacy.dpNoisyCounts(df, Seq("g"), label, secret.getBytes)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = release("secret-one-0123456789abcdef", "census")
    // same (secret, label) => identical release (the determinism contract)
    assert(a === release("secret-one-0123456789abcdef", "census"))
    // a different SECRET under the SAME public label => different draws:
    // the advisor-r16 property — knowing the label alone cannot replay
    assert(a !== release("secret-two-0123456789abcdef", "census"))
    // label separation still holds under one secret
    assert(a !== release("secret-one-0123456789abcdef", "census-2"))
    // a short secret fails loudly rather than seeding weak noise
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, Seq("g"), "census", "short".getBytes).collect()
    }
  }

  test("dp draw keying is null-safe and separator-injection-proof") {
    import spark.implicits._
    val secret = "privacy-spec-secret-0123456789abcdef".getBytes
    // NULL group values must get real per-(label) draws, not the constant
    // ELSE clamp (+maxNoise) that concat-of-NULL used to fall into
    val nulls = (1L to 600L).map(i =>
      (if (i % 3 == 0) null else "g" + (i % 2).toString, i)).toDF("g", "id")
    def nullNoise(label: String): Long = {
      val m = Privacy.dpNoisyCounts(nulls, Seq("g"), label, secret)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      m(null) - 200L // true count of the null-keyed group is 600/3 = 200
    }
    val draws = Seq("nl-a", "nl-b", "nl-c", "nl-d", "nl-e", "nl-f").map(nullNoise)
    assert(draws.forall(d => math.abs(d) <= 40L))
    assert(draws.distinct.size > 1,
      s"null-keyed groups must draw per-label noise, got constant $draws")
    assert(!draws.forall(_ == 40L), "null keys must never hit the ELSE clamp constantly")
    // two distinct group TUPLES whose ':'-joined spellings collide must
    // still draw independently (length-prefixed keying)
    val ab = Seq(("a:b", "c", 1L)).toDF("x", "y", "id")
    val a_bc = Seq(("a", "b:c", 1L)).toDF("x", "y", "id")
    // not a property that MUST differ for one probe, but across 8 labels
    // at least one must: identical-for-all-labels means the keys collide
    val diffs = (1 to 8).map { i =>
      val l = s"inj-$i"
      val n1 = Privacy.dpNoisyCounts(ab, Seq("x", "y"), l, secret).collect()(0).getLong(2) - 1L
      val n2 = Privacy.dpNoisyCounts(a_bc, Seq("x", "y"), l, secret).collect()(0).getLong(2) - 1L
      n1 == n2
    }
    assert(diffs.contains(false),
      "('a:b','c') and ('a','b:c') drew identically under 8 labels: separator collision")
  }
}
