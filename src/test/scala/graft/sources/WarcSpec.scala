package graft.sources

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WarcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def http200(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
      .getBytes(StandardCharsets.UTF_8)

  private def sample = Seq(
    Warc.WarcRecord("warcinfo", "", "<urn:uuid:info-1>", "application/warc-fields",
      "software: graft-test\r\n".getBytes(StandardCharsets.UTF_8)),
    Warc.WarcRecord("request", "https://a.example.com/x", "<urn:uuid:req-1>",
      "application/http;msgtype=request",
      "GET /x HTTP/1.1\r\nHost: a.example.com\r\n\r\n".getBytes(StandardCharsets.UTF_8)),
    Warc.WarcRecord("response", "https://a.example.com/x", "<urn:uuid:resp-1>",
      "application/http;msgtype=response", http200("hello warc body")),
    Warc.WarcRecord("response", "https://b.example.org/y", "<urn:uuid:resp-2>",
      "application/http;msgtype=response",
      "HTTP/1.1 404 Not Found\r\n\r\nmissing".getBytes(StandardCharsets.UTF_8)))

  test("round-trip: gzipped (member-per-record) and plain parse identically") {
    for (bytes <- Seq(Warc.writeWarcGz(sample), Warc.writeWarc(sample))) {
      val got = Warc.parse(bytes)
      assert(got.map(_.warcType) === Seq("warcinfo", "request", "response", "response"))
      assert(got.map(_.targetUri) === sample.map(_.targetUri))
      assert(got(2).payload.toSeq === sample(2).payload.toSeq)
    }
  }

  test("binary payloads survive byte-exactly (payload may contain CRLFCRLF)") {
    val tricky = Array[Byte](13, 10, 13, 10, 0, -1, 127, 13, 10)
    val rec = Warc.WarcRecord("resource", "https://c.example.com/bin",
      "<urn:uuid:bin-1>", "application/octet-stream", tricky)
    val got = Warc.parse(Warc.writeWarcGz(Seq(rec, sample(2))))
    assert(got.length === 2)
    assert(got(0).payload.toSeq === tricky.toSeq)
  }

  test("http helpers: status line and body split") {
    assert(Warc.httpStatus(sample(2).payload) === 200)
    assert(Warc.httpStatus(sample(3).payload) === 404)
    assert(new String(Warc.httpBody(sample(2).payload), StandardCharsets.UTF_8) === "hello warc body")
    assert(Warc.httpStatus("not http".getBytes) === 0)
  }

  test("truncation and garbage stop the parse at the failure point, never throw") {
    val full = Warc.writeWarc(sample)
    val truncated = full.take(full.length - sample(3).payload.length - 2)
    val got = Warc.parse(truncated)
    assert(got.length === 3, "records before the truncation point survive")
    assert(Warc.parse("totally not a warc".getBytes) === Nil)
    assert(Warc.parse(null) === Nil)
    // a corrupt gzip stream yields Nil rather than a task failure
    val gz = Warc.writeWarcGz(sample)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    Warc.parse(gz) // must not throw (may yield a prefix)
  }

  test("streaming parse: a lying Content-Length stops the parse, never allocates it") {
    // record claims 8 GB of payload — a whole-file or trust-the-header
    // parser would try to allocate it; the streaming parser treats a
    // length past MaxRecordBytes as the malformation point
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:lie>\r\n" +
      "Content-Length: 8589934592\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val good = Warc.writeWarc(sample.take(2))
    assert(Warc.parse(good ++ lying).map(_.warcType) === Seq("warcinfo", "request"))
    // an over-long header line is a malformation, not an unbounded buffer
    val longLine = ("WARC/1.0\r\nX-Junk: " + "a" * (2 << 20)).getBytes(StandardCharsets.UTF_8)
    assert(Warc.parse(Warc.writeWarc(sample.take(1)) ++ longLine).length === 1)
  }

  test("charset ladder: BOM > transport declaration > meta prescan > UTF-8-validate/1252") {
    val cafeUtf8 = "café".getBytes(StandardCharsets.UTF_8)
    val cafe1252 = "café".getBytes("windows-1252") // 0xE9 single byte
    // 4) undeclared: valid UTF-8 decodes as UTF-8; invalid falls back to 1252
    assert(Warc.decodeBody(cafeUtf8, null) === "café")
    assert(Warc.sniffCharsetName(cafeUtf8, null) === "UTF-8")
    assert(Warc.decodeBody(cafe1252, null) === "café")
    assert(Warc.sniffCharsetName(cafe1252, null) === "windows-1252")
    // 2) declared wins over sniffed: these bytes are VALID UTF-8 ("cafÃ©")
    // but the transport says 1252, so 1252 it is — the WHATWG rule
    assert(Warc.decodeBody(cafeUtf8, "text/html; charset=windows-1252") === "cafÃ©")
    assert(Warc.decodeBody(cafe1252, "text/html; charset=ISO-8859-1") === "café")
    assert(Warc.decodeBody(cafe1252, "text/plain; charset=\"latin1\"") === "café")
    // 1) BOM wins over a (wrong) declaration and is stripped
    val bomUtf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ cafeUtf8
    assert(Warc.decodeBody(bomUtf8, "text/html; charset=windows-1252") === "café")
    val bomLe = Array[Byte](0xff.toByte, 0xfe.toByte) ++ "hi".getBytes(StandardCharsets.UTF_16LE)
    assert(Warc.decodeBody(bomLe, null) === "hi")
    // 3) meta prescan when the transport is silent, both spellings
    val metaA = ("<html><head><meta charset=\"windows-1252\"></head>" +
      "<body>café</body></html>").getBytes("windows-1252")
    assert(Warc.decodeBody(metaA, "text/html") === new String(metaA, "windows-1252"))
    val metaB = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=shift_jis\"></head><body></body></html>")
      .getBytes(StandardCharsets.US_ASCII)
    assert(Warc.sniffCharsetName(metaB, "text/html") === "Shift_JIS")
    // idempotent on ASCII: every arm decodes pure ASCII identically
    val ascii = "plain ascii body 123".getBytes(StandardCharsets.US_ASCII)
    for (decl <- Seq(null, "text/html; charset=utf-8", "text/html; charset=windows-1252"))
      assert(Warc.decodeBody(ascii, decl) === "plain ascii body 123")
    // declared-but-malformed decodes with U+FFFD, never throws
    val broken = Array[Byte](0x61, 0xc3.toByte) // 'a' + dangling UTF-8 lead
    assert(Warc.decodeBody(broken, "text/html; charset=utf-8") === "a�")
    // unknown label falls through to the content sniff
    assert(Warc.sniffCharsetName(cafe1252, "text/html; charset=klingon-8") === "windows-1252")
  }

  test("recordsDF decodes response bodies by their HTTP charset and WET by WARC content-type") {
    import spark.implicits._
    val resp1252 = Warc.WarcRecord("response", "https://legacy.example.com/p",
      "<urn:uuid:cs-1>", "application/http;msgtype=response",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=windows-1252\r\n\r\n" +
        "résumé").getBytes("windows-1252"))
    val wetSjis = Warc.WarcRecord("conversion", "https://jp.example.com/q",
      "<urn:uuid:cs-2>", "text/plain; charset=shift_jis",
      "日本語".getBytes("Shift_JIS"))
    val rows = Warc.recordsDF(Seq((1L, Warc.writeWarcGz(Seq(resp1252, wetSjis))))
        .toDF("warc_id", "content"))
      .collect().sortBy(_.getString(2))
    assert(rows.find(_.getString(1) == "response").get.getString(5) === "résumé")
    assert(rows.find(_.getString(1) == "response").get.getString(7) === "windows-1252")
    assert(rows.find(_.getString(1) == "conversion").get.getString(5) === "日本語")
    assert(rows.find(_.getString(1) == "conversion").get.getString(7) === "Shift_JIS")
  }

  test("WET conversion records: payload IS the text (no HTTP envelope)") {
    import spark.implicits._
    val wet = Seq(
      Warc.WarcRecord("warcinfo", "", "<urn:uuid:wi>", "application/warc-fields",
        "software: graft\r\n".getBytes(StandardCharsets.UTF_8)),
      Warc.WarcRecord("conversion", "https://a.example.com/x", "<urn:uuid:conv-1>",
        "text/plain", "extracted page text, already clean".getBytes(StandardCharsets.UTF_8)))
    val rows = Warc.recordsDF(Seq((9L, Warc.writeWarcGz(wet))).toDF("warc_id", "content"))
      .collect().sortBy(_.getString(1))
    assert(rows.length === 2)
    val conv = rows.find(_.getString(1) == "conversion").get
    assert(conv.getString(5) === "extracted page text, already clean")
    assert(conv.getInt(4) === 0) // no HTTP status on conversion records
  }

  test("revisit records and 3xx Location headers round-trip and surface as columns") {
    import spark.implicits._
    val recs = Seq(
      Warc.WarcRecord("response", "https://c.com/a", "<urn:uuid:r-1>",
        "application/http;msgtype=response",
        ("HTTP/1.1 301 Moved Permanently\r\nLocation: /b\r\n" +
          "Content-Type: text/html\r\n\r\n").getBytes(StandardCharsets.UTF_8)),
      Warc.WarcRecord("response", "https://c.com/b", "<urn:uuid:r-2>",
        "application/http;msgtype=response",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nok body")
          .getBytes(StandardCharsets.UTF_8)),
      Warc.WarcRecord("revisit", "https://c.com/dup", "<urn:uuid:r-3>",
        "application/http;msgtype=revisit", Array.emptyByteArray,
        refersTo = "<urn:uuid:r-2>", refersToUri = "https://c.com/b",
        profile = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"))
    // parse-level round trip of the §6.7 headers
    val parsed = Warc.parse(Warc.writeWarcGz(recs))
    val rv = parsed.find(_.warcType == "revisit").get
    assert(rv.refersTo === "<urn:uuid:r-2>")
    assert(rv.refersToUri === "https://c.com/b")
    assert(rv.profile.endsWith("identical-payload-digest"))
    assert(parsed.find(_.warcType == "response").get.refersTo === null)
    // frame-level columns
    val rows = Warc.recordsDF(Seq((1L, Warc.writeWarcGz(recs))).toDF("warc_id", "content"))
      .select("target_uri", "http_status", "location", "refers_to_uri", "revisit_profile")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(rows.toSet === Set(
      ("https://c.com/a", 301, "/b", null, null),
      ("https://c.com/b", 200, null, null, null), // Location only on 3xx
      ("https://c.com/dup", 0, null, "https://c.com/b",
        "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")))
  }

  test("recordsDF flattens files to records: narrow, response bodies extracted") {
    import spark.implicits._
    val df = Seq(
      (1L, Warc.writeWarcGz(sample)),
      (2L, Warc.writeWarc(sample.take(1)))).toDF("warc_id", "content")
    val rows = Warc.recordsDF(df).collect()
    assert(rows.length === 5)
    val resp = rows.filter(_.getString(1) == "response").sortBy(_.getString(2))
    assert(resp.map(_.getInt(4)).toSeq === Seq(200, 404))
    assert(resp(0).getString(5) === "hello warc body")
    assert(rows.filter(_.getString(1) == "warcinfo").forall(_.isNullAt(5)))
  }
}
