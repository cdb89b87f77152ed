package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("train reproduces the hand-computed greedy merge sequence") {
    import spark.implicits._
    // word histogram after lowercase+filter: "abab" x4 (ABAB lowercases in),
    // "abc" x2, "cc" x1; "x9" and "!!" are filtered out, not counted
    val docs = Seq(
      (1L, "abab abc ABAB x9 abab"),
      (2L, "abab abc cc !!")).toDF("doc_id", "text")
    // round 1 pairs (overlaps counted): (a,b)=4*2+2=10, (b,a)=4, (b,c)=2,
    //   (c,c)=1 -> merge (a,b) n=10
    // round 2 over [ab ab]x4 [ab c]x2 [c c]: (ab,ab)=4 -> n=4
    // round 3 over [abab]x4 [ab c]x2 [c c]: (ab,c)=2 -> n=2
    // round 4: (c,c)=1 -> n=1; round 5: nothing left -> early stop
    val merges = Bpe.train(docs, "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges === Seq(
      (1L, "a", "b", 10L), (2L, "ab", "ab", 4L), (3L, "ab", "c", 2L), (4L, "c", "c", 1L)))
  }

  test("tie-break is (count desc, lhs asc, rhs asc)") {
    import spark.implicits._
    // (a,b) and (a,c) both occur twice; (a,b) < (a,c)
    val docs = Seq((1L, "ab ab ac ac")).toDF("doc_id", "text")
    val first = Bpe.train(docs, "text", k = 1).collect()(0)
    assert((first.getString(1), first.getString(2), first.getLong(3)) === ("a", "b", 2L))
  }

  test("applyMerge is greedy left-to-right (overlaps collapse like the scan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def merged(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), a, b)).collect()(0).getSeq[String](0).toSeq
    assert(merged(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(merged(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(merged(Seq("x", "y", "y"), "x", "y") === Seq("xy", "y"))
    assert(merged(Seq("y", "x", "y"), "x", "y") === Seq("y", "xy"))
    assert(merged(Seq("b"), "a", "b") === Seq("b"))
    assert(merged(Seq.empty, "a", "b") === Seq.empty)
    // a freshly merged token re-merges only on a genuine text match
    assert(merged(Seq("x", "x", "x"), "xx", "x") === Seq("x", "x", "x"))
    assert(merged(Seq("xx", "x", "x"), "xx", "x") === Seq("xxx", "x"))
  }

  test("encode applies merges in rank order and ids resolve via first-wins vocab") {
    import spark.implicits._
    val docs = Seq((7L, "abab cc zq"), (8L, "abc")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val out = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // chars present: a,b,c,q,z -> ids a=0,b=1,c=2,q=3,z=4; ab=5, abab=6
    assert(out.toSeq === Seq(
      (7L, 1L, "abab", 6L), (7L, 2L, "c", 2L), (7L, 3L, "c", 2L),
      (7L, 4L, "z", 4L), (7L, 5L, "q", 3L),
      (8L, 1L, "ab", 5L), (8L, 2L, "c", 2L)))
  }

  test("vocab: duplicate merge products keep their first id") {
    // ("a","bc") and ("ab","c") both mint "abc": id from the earlier rank
    val v = Bpe.vocab(Seq("a", "b", "c"), Seq(("a", "bc"), ("ab", "c")))
    assert(v("abc") === 3L)
    assert(v.size === 4) // a b c abc
  }

  test("byte arm: first merge is the dominant byte pair, spelled in hex") {
    import spark.implicits._
    // 'a' = 0x61; "aa" x3 plants pair (61, 61) with corpus weight 6
    // (2 adjacent occurrences per "aaa"? no — "aa" has 1) -> n = 3
    val docs = Seq((1L, "aa aa aa Zb")).toDF("doc_id", "text")
    val m = Bpe.trainBytes(docs, "text", 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1L, "61", "61", 3L)))
  }

  test("byte arm is TOTAL: emoji/CJK/mixed-case text encodes with no UNK and round-trips") {
    import spark.implicits._
    val texts = Seq((1L, "Héllo wörld 日本語 🎉🎉"), (2L, "MIXED Case tokens"), (3L, "🎉🎉 🎉🎉"))
    val docs = texts.toDF("doc_id", "text")
    val merges = Bpe.trainBytes(docs, "text", 6)
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Bpe.encodeBytes(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "pos").collect()
    // totality: per doc, the concatenated token bytes == the UTF-8 bytes
    // of its whitespace-joined words (nothing dropped, nothing UNK'd)
    for ((id, text) <- texts) {
      val toks = out.filter(_.getLong(0) == id).map(_.getString(2))
      val decoded = new String(toks.flatMap(Bpe.byteTokenBytes), "UTF-8")
      assert(decoded === text.trim.split("\\s+").mkString(""),
        s"doc $id must round-trip byte-exactly")
    }
    // fixed alphabet: ids 0..255 are the sorted hex alphabet, corpus-free
    assert(out.forall(_.getLong(3) >= 0L))
    val v = Bpe.vocab(Bpe.ByteAlphabet, merges)
    assert(v("00") === 0L && v("ff") === 255L)
    assert(out.forall(r => v(r.getString(2)) == r.getLong(3)))
  }

  test("byte arm: multi-byte UTF-8 merges cross character boundaries legally") {
    import spark.implicits._
    // U+00E9 'é' = c3 a9; a corpus of "éé" must merge (c3, a9) first —
    // byte-level BPE sees bytes, not characters
    val docs = Seq((1L, "éé éé")).toDF("doc_id", "text")
    val m = Bpe.trainBytes(docs, "text", 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) === ("c3", "a9"))
  }
}
