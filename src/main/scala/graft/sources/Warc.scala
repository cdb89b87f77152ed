package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) reader + writer — the container format
  * web-scale training corpora actually arrive in (Common Crawl ships
  * every crawl as gzipped WARC). A 100 TB text pipeline's FIRST
  * operator is "turn WARC responses into a documents table"; this is
  * that source, pure JVM, implemented from the public spec:
  *
  *  - record grammar: `WARC/1.0\r\n` + named headers + `\r\n` +
  *    Content-Length payload bytes + `\r\n\r\n` record boundary;
  *  - gzip: one gzip MEMBER per record (the Common Crawl convention
  *    that makes records independently seekable); java's
  *    GZIPInputStream reads concatenated members natively, and plain
  *    uncompressed WARC is accepted too (magic-byte dispatch);
  *  - HTTP response records: payload = status line + headers +
  *    `\r\n\r\n` + body; [[httpBody]] splits the body out and
  *    [[httpStatus]] reads the code — enough to keep 200s and drop the
  *    rest, which is the curation move.
  *
  * Scale shape: WARC files arrive one-per-row (binaryFile source or a
  * (path, content) frame); [[recordsDF]] flatMaps each file through the
  * sequential parser in a narrow mapPartitions — no shuffle, files are
  * the parallelism unit exactly as in warcio-style stacks (the
  * per-record gzip members make intra-file splitting possible but
  * per-file sequential parse is the standard shape; a 100 TB crawl is
  * millions of ~1 GB files, far wider than any cluster). Malformed
  * records stop the file's parse at the failure point rather than
  * throwing the task (partial crawl files are routine); the record
  * count makes truncation observable. */
object Warc {

  /** One WARC record. `refersTo`/`refersToUri`/`profile` carry the
    * `revisit` linkage headers (ISO 28500 §6.7 — `WARC-Refers-To`,
    * `WARC-Refers-To-Target-URI`, `WARC-Profile`): a revisit record is
    * the CRAWLER'S OWN dedup evidence ("this fetch matched an earlier
    * capture"), free signal a curation pipeline should consume rather
    * than re-derive. Null for every other record type. */
  final case class WarcRecord(warcType: String, targetUri: String,
                              recordId: String, contentType: String,
                              payload: Array[Byte],
                              refersTo: String = null,
                              refersToUri: String = null,
                              profile: String = null)

  private val CRLF = "\r\n"

  /** Serialize records as WARC/1.0, one gzip member per record. Each
    * member's stream is CLOSED (releases its Deflater's native
    * workspace — the TextAnalysis deflate-ratio lesson) behind a shield
    * that keeps the shared byte sink open. */
  def writeWarcGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val shield = new java.io.FilterOutputStream(out) {
      override def close(): Unit = flush() // member close must not close the sink
    }
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(shield)
      gz.write(recordBytes(r))
      gz.close()
    }
    out.toByteArray
  }

  /** Serialize records as plain (uncompressed) WARC/1.0. */
  def writeWarc(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(recordBytes(r)))
    out.toByteArray
  }

  private def recordBytes(r: WarcRecord): Array[Byte] = {
    val h = new StringBuilder()
    h.append("WARC/1.0").append(CRLF)
    h.append("WARC-Type: ").append(r.warcType).append(CRLF)
    if (r.targetUri != null && r.targetUri.nonEmpty)
      h.append("WARC-Target-URI: ").append(r.targetUri).append(CRLF)
    h.append("WARC-Record-ID: ").append(r.recordId).append(CRLF)
    h.append("WARC-Date: 2026-01-01T00:00:00Z").append(CRLF) // fixed: deterministic bytes
    if (r.refersTo != null && r.refersTo.nonEmpty)
      h.append("WARC-Refers-To: ").append(r.refersTo).append(CRLF)
    if (r.refersToUri != null && r.refersToUri.nonEmpty)
      h.append("WARC-Refers-To-Target-URI: ").append(r.refersToUri).append(CRLF)
    if (r.profile != null && r.profile.nonEmpty)
      h.append("WARC-Profile: ").append(r.profile).append(CRLF)
    if (r.contentType != null && r.contentType.nonEmpty)
      h.append("Content-Type: ").append(r.contentType).append(CRLF)
    h.append("Content-Length: ").append(r.payload.length).append(CRLF)
    h.append(CRLF)
    val head = h.toString.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + r.payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(r.payload, 0, out, head.length, r.payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Per-record payload bound: a Content-Length past this is treated as a
    * malformation (parse stops there). WARC convention caps records around
    * this size (Common Crawl truncates at 1 MiB; the spec has no limit but
    * a multi-GiB single record cannot be a JVM byte array anyway), and a
    * LOUD bound beats an OutOfMemoryError from a lying length header. */
  val MaxRecordBytes: Long = 1L << 30

  private val MaxHeaderLineBytes = 1 << 20

  /** Parse a WARC file (gzipped — multi-member — or plain). Returns the
    * records parsed up to the first malformation/truncation point.
    *
    * STREAMING: the gzip stream is decoded record-by-record, never
    * inflated whole (advisor r16, medium: Common Crawl's ~1 GB gzipped
    * WARCs decompress to 3–5 GB — past the JVM's 2 GB array limit, so a
    * whole-file buffer OOMs on exactly the inputs the docstring targets).
    * Only one record's payload is ever materialized at a time, bounded by
    * [[MaxRecordBytes]]. */
  def parse(content: Array[Byte]): Seq[WarcRecord] = {
    if (content == null || content.length < 4) return Nil
    val base = new ByteArrayInputStream(content)
    val in: java.io.InputStream =
      if ((content(0) & 0xff) == 0x1f && (content(1) & 0xff) == 0x8b) {
        try new java.util.zip.GZIPInputStream(base, 65536)
        catch { case scala.util.control.NonFatal(_) => return Nil }
      } else base
    // buffer the inflater output: readLine's byte-at-a-time reads must not
    // each pay an Inflater call
    try parseStream(new java.io.BufferedInputStream(in, 65536)) finally {
      try in.close() catch { case scala.util.control.NonFatal(_) => }
    }
  }

  /** Read one header line (up to LF, CRLF-tolerant) from the stream;
    * null at EOF. A line past [[MaxHeaderLineBytes]] throws (malformed —
    * caught by [[parseStream]] as the truncation point). */
  private def readLine(in: java.io.InputStream): String = {
    val buf = new ByteArrayOutputStream(96)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      buf.write(b)
      if (buf.size > MaxHeaderLineBytes)
        throw new java.io.IOException("WARC header line exceeds bound")
      b = in.read()
    }
    val bytes = buf.toByteArray
    val len = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
              else bytes.length
    new String(bytes, 0, len, StandardCharsets.UTF_8)
  }

  /** Fill exactly n bytes; null when the stream ends first (truncation).
    * Allocation grows geometrically (64 KiB start, ×4) with bytes ACTUALLY
    * read, never up-front from the untrusted Content-Length header: a
    * truncated/crafted WARC claiming a 1 GiB record costs only the bytes
    * present, not a 1 GiB allocation per task (advisor r17). */
  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    if (n == 0) return Array.emptyByteArray
    var cap = math.min(n, 64 * 1024)
    var out = new Array[Byte](cap)
    var off = 0
    while (off < n) {
      if (off == cap) {
        cap = math.min(n.toLong, cap.toLong * 4).toInt
        out = java.util.Arrays.copyOf(out, cap)
      }
      val r = in.read(out, off, cap - off)
      if (r < 0) return null
      off += r
    }
    out
  }

  private def parseStream(in: java.io.InputStream): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    try {
      var done = false
      while (!done) {
        val version = readLine(in)
        if (version == null) done = true // clean EOF
        else if (version.isEmpty) { /* inter-record blank separator */ }
        else if (!version.startsWith("WARC/")) done = true // malformed: stop
        else {
          var wtype = ""; var uri = ""; var rid = ""; var ctype = ""; var clen = -1L
          var refersTo: String = null; var refersToUri: String = null
          var profile: String = null
          var hl = readLine(in)
          while (hl != null && hl.nonEmpty) {
            val colon = hl.indexOf(':')
            if (colon > 0) {
              val k = hl.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
              val v = hl.substring(colon + 1).trim
              k match {
                case "warc-type" => wtype = v
                case "warc-target-uri" => uri = v
                case "warc-record-id" => rid = v
                case "warc-refers-to" => refersTo = v
                case "warc-refers-to-target-uri" => refersToUri = v
                case "warc-profile" => profile = v
                case "content-type" => ctype = v
                case "content-length" =>
                  clen = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ =>
              }
            }
            hl = readLine(in)
          }
          if (hl == null || clen < 0 || clen > MaxRecordBytes) done = true
          else {
            val payload = readFully(in, clen.toInt)
            if (payload == null) done = true // truncated mid-payload
            else out += WarcRecord(wtype, uri, rid, ctype, payload,
              refersTo, refersToUri, profile)
          }
        }
      }
    } catch {
      // corrupt gzip member / over-long header mid-stream: the documented
      // "stop at the truncation point" behavior, records-so-far kept
      case scala.util.control.NonFatal(_) =>
    }
    out.toSeq
  }

  /** Body of an HTTP message payload (bytes after the first CRLFCRLF);
    * the whole payload when no header/body split exists. */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload
  }

  /** Value of a named header in an HTTP message's head block (the bytes
    * before the first CRLFCRLF), case-insensitive; null when absent or
    * when the payload has no head block. Scans at most the head block —
    * bodies are never touched. */
  def httpHeaderValue(payload: Array[Byte], name: String): String = {
    var i = 0
    var lineStart = 0
    var firstLine = true
    val target = name.toLowerCase(java.util.Locale.ROOT)
    while (i + 1 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n') {
        if (i == lineStart) return null // blank line = end of head block
        if (!firstLine) {
          val line = new String(payload, lineStart, i - lineStart, StandardCharsets.ISO_8859_1)
          val colon = line.indexOf(':')
          if (colon > 0 &&
              line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT) == target)
            return line.substring(colon + 1).trim
        }
        firstLine = false
        lineStart = i + 2
        i += 2
      } else i += 1
    }
    null
  }

  // ---------------------------------------------------------------------
  // Charset-aware body decoding — the WHATWG encoding-sniffing ladder.
  // Real crawls are a charset zoo (legacy windows-1252 / Shift-JIS pages
  // are a double-digit percent of the web); decoding everything as UTF-8
  // silently mojibakes every downstream text operator (dedup keys,
  // quality rules, langid, tokenizers). Ladder, per the WHATWG Encoding
  // Standard's `decode` + HTML's encoding sniffing algorithm:
  //   1. BOM (in-band byte-order mark wins over every declaration);
  //   2. the transport declaration (HTTP Content-Type `charset=` param,
  //      or the WARC Content-Type for WET conversion records);
  //   3. a `<meta charset=…>` / `http-equiv` scan of the first 1024
  //      bytes (the standard's prescan, ASCII-superset assumption);
  //   4. content sniff: strict-validate as UTF-8; invalid sequences fall
  //      back to windows-1252 (the WHATWG default for the legacy web —
  //      it also decodes every byte, so this arm is total).
  // Declared encodings decode with REPLACE (malformed input → U+FFFD,
  // the standard's error mode), so the decoder NEVER throws — the
  // never-throw fuzz law covers it.
  // ---------------------------------------------------------------------

  /** WHATWG label → JVM charset, for the labels that matter on the real
    * web. `ascii`/`latin1`/`iso-8859-1` map to windows-1252 per the
    * standard (browsers never decode 8859-1 as itself); unknown labels
    * return null (→ the content-sniff arm). */
  private[sources] def charsetForLabel(label: String): java.nio.charset.Charset = {
    if (label == null) return null
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
      .stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")
    val name = l match {
      case "" => null
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => "UTF-8"
      case "ascii" | "us-ascii" | "latin1" | "latin-1" | "iso-8859-1" | "iso8859-1" |
           "windows-1252" | "cp1252" | "x-cp1252" | "iso-ir-100" | "l1" => "windows-1252"
      case "utf-16" | "utf-16le" | "ucs-2" => "UTF-16LE"
      case "utf-16be" => "UTF-16BE"
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" => "Shift_JIS"
      case "euc-jp" | "x-euc-jp" => "EUC-JP"
      case "gbk" | "gb2312" | "gb_2312" | "x-gbk" | "chinese" => "GBK"
      case "gb18030" => "GB18030"
      case "big5" | "big5-hkscs" | "x-x-big5" => "Big5"
      case "euc-kr" | "korean" | "ks_c_5601-1987" => "EUC-KR"
      case "koi8-r" | "koi8" => "KOI8-R"
      case "koi8-u" => "KOI8-U"
      case other if other.startsWith("iso-8859-") || other.startsWith("windows-125") =>
        other // JVM knows these families by their WHATWG names
      case _ => null
    }
    if (name == null) null
    else try java.nio.charset.Charset.forName(name)
    catch { case scala.util.control.NonFatal(_) => null }
  }

  /** `charset=` parameter of a Content-Type value (null when absent). */
  private[sources] def charsetParam(contentType: String): String = {
    if (contentType == null) return null
    val lc = contentType.toLowerCase(java.util.Locale.ROOT)
    val at = lc.indexOf("charset=")
    if (at < 0) return null
    val start = at + "charset=".length
    var end = start
    while (end < contentType.length && contentType.charAt(end) != ';' &&
           contentType.charAt(end) != ' ' && contentType.charAt(end) != '\t') end += 1
    contentType.substring(start, end)
  }

  private val MetaScanBytes = 1024
  private val MetaCharsetRe =
    java.util.regex.Pattern.compile(
      "<meta[^>]{0,512}?charset\\s*=\\s*[\"']?([a-zA-Z0-9._:-]+)",
      java.util.regex.Pattern.CASE_INSENSITIVE)

  /** `<meta charset=…>` / `http-equiv content-type` label from the first
    * 1024 bytes (the WHATWG prescan window), or null. The window is
    * decoded as latin-1 — an ASCII superset, which is all the prescan
    * assumes about the real encoding. */
  private[sources] def metaCharsetLabel(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return null
    val n = math.min(bytes.length, MetaScanBytes)
    val window = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
    val m = MetaCharsetRe.matcher(window)
    if (m.find()) m.group(1) else null
  }

  /** (charset, BOM-length) after the sniffing ladder; bomLen > 0 means the
    * mark must be dropped from the decoded text. */
  private[sources] def sniffCharset(bytes: Array[Byte],
                                    declaredContentType: String): (java.nio.charset.Charset, Int) = {
    // 1. BOM
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return (StandardCharsets.UTF_8, 3)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return (StandardCharsets.UTF_16BE, 2)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return (StandardCharsets.UTF_16LE, 2)
    // 2. transport declaration
    val declared = charsetForLabel(charsetParam(declaredContentType))
    if (declared != null) return (declared, 0)
    // 3. meta prescan
    val meta = charsetForLabel(metaCharsetLabel(bytes))
    if (meta != null) return (meta, 0)
    // 4. content sniff: strict UTF-8 validation, else windows-1252
    if (isValidUtf8(bytes)) (StandardCharsets.UTF_8, 0)
    else (java.nio.charset.Charset.forName("windows-1252"), 0)
  }

  private[sources] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val len = if (c >= 0xc2 && c <= 0xdf) 2
                  else if (c >= 0xe0 && c <= 0xef) 3
                  else if (c >= 0xf0 && c <= 0xf4) 4
                  else return false
        if (i + len > n) return false
        var j = 1
        while (j < len) {
          if ((b(i + j) & 0xc0) != 0x80) return false
          j += 1
        }
        // reject overlongs and surrogates/out-of-range the table way
        if (len == 3) {
          if (c == 0xe0 && (b(i + 1) & 0xff) < 0xa0) return false
          if (c == 0xed && (b(i + 1) & 0xff) > 0x9f) return false
        } else if (len == 4) {
          if (c == 0xf0 && (b(i + 1) & 0xff) < 0x90) return false
          if (c == 0xf4 && (b(i + 1) & 0xff) > 0x8f) return false
        }
        i += len
      }
    }
    true
  }

  /** Decode a crawl body through the sniffing ladder. Total: malformed
    * input under a declared encoding decodes with U+FFFD replacement (the
    * WHATWG error mode), never throws. Null in → null out. */
  def decodeBody(bytes: Array[Byte], declaredContentType: String): String = {
    if (bytes == null) return null
    val (cs, bomLen) = sniffCharset(bytes, declaredContentType)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes, bomLen, bytes.length - bomLen)).toString
    catch { case scala.util.control.NonFatal(_) =>
      new String(bytes, bomLen, bytes.length - bomLen, StandardCharsets.ISO_8859_1)
    }
  }

  /** Name of the charset the ladder picks — surfaced as a column so
    * corpus audits can see the encoding mix. */
  def sniffCharsetName(bytes: Array[Byte], declaredContentType: String): String =
    if (bytes == null) null else sniffCharset(bytes, declaredContentType)._1.name()

  /** HTTP status code of a response payload (0 when unparsable). */
  def httpStatus(payload: Array[Byte]): Int = {
    var end = 0
    while (end < payload.length && payload(end) != '\n' && end < 256) end += 1
    val l = new String(payload, 0, end, StandardCharsets.UTF_8)
    val parts = l.trim.split(" ")
    if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
      try parts(1).toInt catch { case _: NumberFormatException => 0 }
    else 0
  }

  /** Flatten a (warc_id, content) frame of WARC files into records:
    * (warc_id, warc_type, target_uri, content_type, http_status,
    * body_text, n_payload_bytes, charset, location, refers_to_uri,
    * revisit_profile). `body_text` is the HTTP body
    * for `response` records (decoded through [[decodeBody]]'s WHATWG
    * sniffing ladder — the HTTP Content-Type header is the transport
    * declaration) and the decoded payload for `conversion` records
    * (WET files — Common Crawl's pre-extracted text — are WARC whose
    * conversion records carry plain text with no HTTP envelope; their
    * WARC Content-Type is the declaration); null for every other type.
    * `charset` is the encoding the ladder picked (an audit column — the
    * encoding mix of a crawl is a curation signal). `location` is the
    * HTTP Location header of 3xx responses (null otherwise) — the raw
    * material of redirect-chain resolution
    * ([[graft.operators.Redirects]]: the canonical URL a page actually
    * lives at is the end of its Location chain). `refers_to_uri` /
    * `revisit_profile` surface `revisit` records (ISO 28500 §6.7): the
    * crawler's own duplicate detections, consumable dedup evidence.
    * Narrow mapPartitions — files are the parallelism unit, no shuffle. */
  def recordsDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("warc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, content) =>
          parse(content).map { r =>
            val isResponse = r.warcType.equalsIgnoreCase("response")
            val isConversion = r.warcType.equalsIgnoreCase("conversion")
            val status = if (isResponse) httpStatus(r.payload) else 0
            val (bodyBytes, declared) =
              if (isResponse) (httpBody(r.payload), httpHeaderValue(r.payload, "content-type"))
              else if (isConversion) (r.payload, r.contentType)
              else (null, null)
            val body = if (bodyBytes == null) null else decodeBody(bodyBytes, declared)
            val cs = if (bodyBytes == null) null else sniffCharsetName(bodyBytes, declared)
            val location =
              if (isResponse && status >= 300 && status <= 399)
                httpHeaderValue(r.payload, "location")
              else null
            val isRevisit = r.warcType.equalsIgnoreCase("revisit")
            (id, r.warcType, r.targetUri, r.contentType, status, body,
              r.payload.length.toLong, cs, location,
              if (isRevisit) r.refersToUri else null,
              if (isRevisit) r.profile else null)
          }
        }
      }.toDF("warc_id", "warc_type", "target_uri", "content_type",
        "http_status", "body_text", "n_payload_bytes", "charset",
        "location", "refers_to_uri", "revisit_profile")
  }
}
