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

  final case class WarcRecord(warcType: String, targetUri: String,
                              recordId: String, contentType: String,
                              payload: Array[Byte])

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

  /** Fill exactly n bytes; null when the stream ends first (truncation). */
  private def readFully(in: java.io.InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n - off)
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
            else out += WarcRecord(wtype, uri, rid, ctype, payload)
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
    * body_text, n_payload_bytes). `body_text` is the UTF-8 HTTP body for
    * `response` records and the raw payload for `conversion` records
    * (WET files — Common Crawl's pre-extracted text — are WARC whose
    * conversion records carry plain text with no HTTP envelope); null
    * for every other type. Narrow mapPartitions — files are the
    * parallelism unit, no shuffle. */
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
            val body =
              if (isResponse) new String(httpBody(r.payload), StandardCharsets.UTF_8)
              else if (isConversion) new String(r.payload, StandardCharsets.UTF_8)
              else null
            (id, r.warcType, r.targetUri, r.contentType, status, body,
              r.payload.length.toLong)
          }
        }
      }.toDF("warc_id", "warc_type", "target_uri", "content_type",
        "http_status", "body_text", "n_payload_bytes")
  }
}
