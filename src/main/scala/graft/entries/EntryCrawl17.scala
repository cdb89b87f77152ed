package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.MaskTransform

/** Query registry: the round-17 crawl-realism additions — WET export,
  * streaming frontier probe, decode→langid composition, anchor text. */
private[graft] trait EntryCrawl17 { this: EntryCore =>

  /** WET EXPORT round-trip — the egress side of the crawl loop: a curated
    * corpus ships as WET (WARC conversion records, the format it arrived
    * in), so the writer matters as much as the reader. Every document
    * exports as a gzipped conversion record (its text as the payload)
    * and re-ingests through [[graft.sources.Warc.recordsDF]]; the decoded
    * body must equal the original text byte-for-byte (gzip + container +
    * charset ladder round-trip), the sniffed charset must be UTF-8, and
    * the payload byte mass must equal the text's UTF-8 mass. FULL-VALUE
    * oracle: everything replays from the documents table itself. */
  private[graft] def qWetExport(spark: SparkSession, dir: String): DataFrame = {
    val mkWet = udf((id: Long, text: String) => {
      import graft.sources.Warc
      Warc.writeWarcGz(Seq(Warc.WarcRecord("conversion",
        s"https://site${id % 20}.example.com/doc/$id", s"<urn:uuid:wet-$id>",
        "text/plain", text.getBytes("UTF-8"))))
    })
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val files = docs.select(col("id").as("warc_id"), col("text"),
      mkWet(col("id"), col("text")).as("content"))
    // both join sides fold to (id, digest, few bounded columns) BEFORE
    // the id-keyed exchange — the 100x ScaleCheck caught the naive join
    // shipping every body TWICE (text + parsed body) through sort-merge
    // (257x bytes); digest equality is the same byte-exact round-trip
    // check at ~50 bytes a row
    val parsed = graft.sources.Warc.recordsDF(files.select(col("warc_id"), col("content")))
      .select(col("warc_id"), md5(col("body_text")).as("body_md5"),
        (col("target_uri") === concat(lit("https://site"),
          pmod(col("warc_id"), lit(20L)), lit(".example.com/doc/"), col("warc_id")))
          .as("uri_ok"),
        col("charset"), col("n_payload_bytes"))
    parsed.join(files.select(col("warc_id"), md5(col("text")).as("text_md5")), "warc_id")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("body_md5") === col("text_md5"), 1)).as("n_roundtrip"),
        count(when(col("uri_ok"), 1)).as("n_uri_match"),
        count(when(col("charset") === "UTF-8", 1)).as("n_utf8"),
        sum(col("n_payload_bytes")).cast("long").as("payload_bytes"))
  }

  /** The frontier novelty probe as a STRUCTURED STREAM — the shape a live
    * ingest runs: discovered urls arrive as micro-batches and each batch
    * is novelty-filtered against the static store via
    * [[graft.operators.Frontier.novelUrls]] inside foreachBatch (the
    * probe's broadcast-confirm join is batch machinery, so foreachBatch
    * is the streaming-legal composition — the stream_foreach_batch
    * harness). The union of per-batch novel sets equals the batch
    * answer: the store is static and novelty is per-url, so batch
    * boundaries are invisible. Shares `frontier_incremental`'s oracle
    * VERBATIM. */
  private[graft] def qStreamFrontierProbe(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id").cast("long").as("id"))
    val seen = docs.where(pmod(col("id"), lit(3L)) =!= 0)
      .select(concat(lit("https://www.front"), pmod(col("id"), lit(20L)),
        lit(".com/p/"), col("id")).as("url"))
    val storeDir = freshTmpStore(spark, "graft_stream_frontier_store").getAbsolutePath
    graft.operators.Frontier.writeSeenStore(seen, "url", storeDir, capacity = 1000000L)
    val out = freshTmpStore(spark, "graft_stream_frontier_sink")
    val stream = streamDocuments(spark, dir)
      .select(col("doc_id").cast("long").as("id"))
      .select(concat(lit("HTTPS://WWW.Front"), pmod(col("id"), lit(20L)),
        lit(".COM:443/p/"), col("id"), lit("?utm_source=x&ref=z#frag")).as("url"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Frontier.novelUrls(spark, storeDir, batch, "url")
          .write.mode("append").parquet(out.getAbsolutePath)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out.getAbsolutePath)
      .withColumn("domain", graft.operators.UrlDomain.urlDomain(col("canon")))
      .withColumn("nid", regexp_extract(col("canon"), "/p/(\\d+)$", 1).cast("long"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_novel"), sum(col("nid")).cast("long").as("novel_id_sum"))
      .orderBy("domain")
  }

  /** Charset decoding FEEDING language-ID — the interaction a real crawl
    * exercises on every page: langid runs over DECODED text, and for
    * non-Latin scripts the decode is load-bearing (a GBK page decoded as
    * 1252 is latin mojibake with zero CJK codepoints — no zh profile
    * gram would ever match). Five arms: undeclared-UTF-8 English,
    * transport-declared GBK Chinese, transport-declared 1252 French,
    * and (r18, with the non-Latin profile set) transport-declared
    * Shift_JIS Japanese and EUC-KR Korean — the zh/ja pair now exercises
    * BOTH ends of the same-script-family separation over two different
    * legacy encodings. The detector is the Cavnar–Trenkle profile ranker
    * ([[graft.operators.LangId]], 17 languages incl. the non-Latin
    * scripts — r18: replaced the 5-language marker heuristic this query
    * first shipped with; the zh arm is hanzi-ONLY, the ja-vs-zh
    * separation the profile set must carry). FULL-VALUE oracle: per-arm
    * counts, the charset the ladder picks, the language the detector
    * must emit, exact decoded bodies, and decoded char mass. */
  private[graft] def qCrawlLangid(spark: SparkSession, dir: String): DataFrame = {
    val mkWarc = udf((id: Long) => {
      import graft.sources.Warc
      val (body, ct, enc) = (id % 5).toInt match {
        case 0 => (s"the report and the data of the crawl is here to stay with us number $id",
          "text/plain", "UTF-8")
        case 1 => (s"你好世界这是一个测试的报告编号 $id", "text/html; charset=gbk", "GBK")
        case 2 => (s"le chat est dans la maison et les champs pour une vie très belle $id",
          "text/html; charset=windows-1252", "windows-1252")
        case 3 => (s"これは日本語のページでありクロールの報告を含んでいます番号 $id",
          "text/html; charset=shift_jis", "Shift_JIS")
        case _ => (s"이것은 한국어 시험 보고서입니다 번호 $id",
          "text/html; charset=euc-kr", "EUC-KR")
      }
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n".getBytes("US-ASCII")
      Warc.writeWarcGz(Seq(Warc.WarcRecord("response", s"https://lang.example.com/$id",
        s"<urn:uuid:lang-$id>", "application/http;msgtype=response",
        head ++ body.getBytes(enc))))
    })
    val files = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id").cast("long").as("id"),
        mkWarc(col("doc_id").cast("long")).as("content"))
      .withColumnRenamed("id", "warc_id")
    val recs = graft.sources.Warc.recordsDF(files)
      .withColumn("case_id", pmod(col("warc_id"), lit(5L)))
    val expected =
      when(col("case_id") === 0, concat(
        lit("the report and the data of the crawl is here to stay with us number "),
        col("warc_id")))
        .when(col("case_id") === 1, concat(lit("你好世界这是一个测试的报告编号 "), col("warc_id")))
        .when(col("case_id") === 2, concat(
          lit("le chat est dans la maison et les champs pour une vie très belle "),
          col("warc_id")))
        .when(col("case_id") === 3, concat(
          lit("これは日本語のページでありクロールの報告を含んでいます番号 "), col("warc_id")))
        .otherwise(concat(lit("이것은 한국어 시험 보고서입니다 번호 "), col("warc_id")))
    recs.withColumn("lang", graft.operators.LangId.langid(col("body_text")))
      .groupBy(col("case_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("charset")).as("charset"),
        min(col("lang")).as("lang"),
        countDistinct(col("lang")).as("n_langs"),
        count(when(col("body_text") === expected, 1)).as("n_exact"),
        sum(length(col("body_text"))).cast("long").as("body_chars"))
      .orderBy("case_id")
  }

  /** Anchor-text aggregation ([[graft.operators.TextAnalysis
    * .extractAnchorPairs]] — incoming anchor text describes the TARGET
    * page, the classic search-quality prior): pages plant two absolute
    * anchors with id-keyed texts plus a relative one (no registrable
    * domain → excluded); per target domain, in-link counts, anchor
    * character mass, and exact text matches. All codegen'd regexp
    * builtins; FULL-VALUE oracle replays from the construction
    * arithmetic. */
  private[graft] def qAnchorText(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Partitioning.spread(table(spark, dir, "documents"))
      .select(col("doc_id").cast("long").as("id"))
    val t1 = concat(lit("read the "), col("id"), lit(" report"))
    val t2 = concat(lit("more "), col("id"), lit(" details"))
    val html = concat(
      lit("<html><body><a class=\"x\" href=\"https://t.targ"),
      pmod(col("id") * 31 + 7, lit(20L)), lit(".io/p\">"), t1,
      lit("</a> and <A HREF='https://u.targ"),
      pmod(col("id") * 17 + 3, lit(20L)), lit(".io/q'>"), t2,
      lit("</A> <a href=\"/relative\">rel</a></body></html>"))
    docs.select(col("id"), t1.as("t1"), t2.as("t2"),
        explode(graft.operators.TextAnalysis.extractAnchorPairs(html)).as("p"))
      .select(col("t1"), col("t2"), col("p.href").as("href"), col("p.anchor").as("anchor"))
      .withColumn("domain", graft.operators.UrlDomain.urlDomain(col("href")))
      .where(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_anchors"),
        sum(length(col("anchor"))).cast("long").as("anchor_chars"),
        count(when(col("anchor") === col("t1") || col("anchor") === col("t2"), 1))
          .as("n_exact"))
      .orderBy("domain")
  }

}
