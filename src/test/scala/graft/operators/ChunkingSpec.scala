package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ChunkingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def chunksOf(text: String, chunkSize: Int, overlap: Int): Seq[(Long, Long, String)] = {
    import spark.implicits._
    Chunking.tokenChunks(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", chunkSize, overlap)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
  }

  test("exact windows: stride, overlap and short final chunk") {
    // 10 tokens, size 4, overlap 1 (stride 3): starts 1,4,7 (10 dropped -
    // the chunk at 7 already reaches the end)
    val got = chunksOf("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 1)
    assert(got === Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10")))
  }

  test("every token is covered and consecutive chunks share exactly overlap tokens") {
    val n = 53
    val text = (1 to n).map(i => s"w$i").mkString(" ")
    for ((size, ov) <- Seq((8, 2), (16, 4), (5, 0))) {
      val got = chunksOf(text, size, ov)
      val toks = got.flatMap(_._3.split(" ")).toSet
      assert(toks === (1 to n).map(i => s"w$i").toSet, s"size=$size ov=$ov coverage")
      got.sliding(2).foreach {
        case Seq((_, _, a), (_, len2, b)) =>
          val (ta, tb) = (a.split(" "), b.split(" "))
          // the next chunk starts stride tokens later, so its first `ov`
          // tokens are the previous (always full) chunk's last `ov`
          assert(tb.take(ov).toSeq === ta.takeRight(ov).toSeq, s"size=$size ov=$ov overlap seam")
          assert(len2 === tb.length)
        case _ =>
      }
    }
  }

  test("doc shorter than one chunk yields exactly one short chunk") {
    assert(chunksOf("a b c", 8, 2) === Seq((0L, 3L, "a b c")))
    assert(chunksOf("single", 8, 2) === Seq((0L, 1L, "single")))
  }

  test("null text produces no chunks; invalid params rejected") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("doc_id", "text")
    val got = Chunking.tokenChunks(df, "doc_id", "text", 4, 1).collect()
    assert(got.map(_.getLong(0)).toSet === Set(2L))
    intercept[IllegalArgumentException](Chunking.tokenChunks(df, "doc_id", "text", 4, 4))
    intercept[IllegalArgumentException](Chunking.tokenChunks(df, "doc_id", "text", 0, 0))
  }

  test("truncateTokens: word-boundary cut, case preserved, short docs intact, null dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "Alpha BETA gamma Delta epsilon"),  // 5 tokens, budget 3
      (2L, "one two"),                         // under budget
      (3L, "  padded   with   runs  "),        // whitespace runs normalize on rejoin
      (4L, null.asInstanceOf[String])          // dropped
    ).toDF("doc_id", "text")
    val out = Chunking.truncateTokens(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[String]("text_trunc") === "Alpha BETA gamma")
    assert(out(0).getAs[Long]("n_tokens") === 5L)
    assert(out(0).getAs[Long]("n_kept") === 3L)
    assert(out(1).getAs[String]("text_trunc") === "one two")
    assert(out(1).getAs[Long]("n_kept") === 2L)
    assert(out(2).getAs[String]("text_trunc") === "padded with runs")
    intercept[IllegalArgumentException](Chunking.truncateTokens(df, "doc_id", "text", 0))
    // narrow plan: no shuffle, no UDF
    val plan = Chunking.truncateTokens(df, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("chunking is a narrow plan: no shuffle, no UDF") {
    import spark.implicits._
    val df = spark.range(100).selectExpr("id AS doc_id", "repeat('tok ', 50) AS text")
    val plan = Chunking.tokenChunks(df, "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("fimTransform: lossless PSM rearrangement, deterministic, edge docs handled") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("the quick brown fox jumps over the lazy dog")),
      (2L, Some("ab")), (3L, Some("")), (4L, None), (5L, Some("héllo wörld 中文"))
    ).toDF("doc_id", "text")
    def read(d: org.apache.spark.sql.DataFrame) = d.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      Option(r.getString(3)))).sortBy(_._1)
    val out = read(Chunking.fimTransform(df, "doc_id", "text"))
    val texts = Map(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "ab", 3L -> "", 5L -> "héllo wörld 中文")
    for ((id, c1, c2, fim) <- out) {
      if (id == 4L) assert(fim.isEmpty)
      else {
        val t = texts(id)
        assert(0 <= c1 && c1 <= c2 && c2 <= t.length, s"doc $id cuts ($c1,$c2)")
        val expected = s"<PRE>${t.substring(0, c1.toInt)}<SUF>${t.substring(c2.toInt)}" +
          s"<MID>${t.substring(c1.toInt, c2.toInt)}"
        assert(fim.contains(expected), s"doc $id")
        // rearrangement is lossless: pre + mid + suf rebuilds the original
        val m = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
        val m(pre, suf, mid) = fim.get
        assert(pre + mid + suf === t, s"doc $id not lossless")
      }
    }
    // deterministic: a second run produces identical rows
    assert(out.toSeq === read(Chunking.fimTransform(df, "doc_id", "text")).toSeq)
    // id column named anything (regression: h2 once referenced the
    // pre-rename name and only "doc_id" inputs analyzed)
    val renamed = read(Chunking.fimTransform(
      df.withColumnRenamed("doc_id", "asset_key"), "asset_key", "text"))
    assert(renamed.toSeq === out.toSeq)
  }
}
