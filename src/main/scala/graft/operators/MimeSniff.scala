package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Content-type sniffing over raw payload bytes — the WHATWG MIME
  * Sniffing Standard's pattern-matching core (the table browsers and
  * crawlers use when servers lie about Content-Type, which they do
  * constantly): a crawl pipeline routes payloads by SNIFFED type —
  * text/HTML to the text operators, images to the perceptual-hash
  * family, containers to their codecs, junk to the discard lane —
  * because trusting the declared header misroutes a double-digit
  * percent of a real crawl.
  *
  * Implemented subset, from the published pattern table: the binary
  * signatures (JPEG/PNG/GIF/WebP/BMP/PDF/ZIP/GZIP/MP3-ID3/MP4-ftyp/
  * RIFF-WAV/OGG/WOFF2), the HTML/XML prescan (case-insensitive tag probe
  * after whitespace skip, the standard's whitespace rule), and the
  * text-vs-binary fallback (the standard's binary byte set: 0x00–0x08,
  * 0x0B, 0x0E–0x1A, 0x1C–0x1F in the first 1445 bytes → octet-stream,
  * else text/plain). Deliberately not implemented: the
  * supplied-type-specific refinement rules (a curation pass sniffs from
  * bytes alone).
  *
  * Scale shape: a pure bounded in-row kernel (≤ 1445 bytes inspected)
  * invoked from a codegen'd expression — no UDF, no shuffle, rides
  * whole-stage codegen over 100 TB of payloads. Total: never throws
  * (fuzz law). */
object MimeSniff {

  private def at(b: Array[Byte], i: Int): Int =
    if (i < b.length) b(i) & 0xff else -1

  private def hasPrefix(b: Array[Byte], off: Int, p: Array[Int]): Boolean = {
    if (off + p.length > b.length) return false
    var i = 0
    while (i < p.length) {
      if (p(i) >= 0 && (b(off + i) & 0xff) != p(i)) return false
      i += 1
    }
    true
  }

  private def P(s: Int*): Array[Int] = s.toArray

  /** Sniff the MIME type of a payload. Null/empty → null. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length == 0) return null
    // binary signatures first (the standard's "pattern matching" step)
    if (hasPrefix(bytes, 0, P(0xff, 0xd8, 0xff))) return "image/jpeg"
    if (hasPrefix(bytes, 0, P(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))) return "image/png"
    if (hasPrefix(bytes, 0, P('G', 'I', 'F', '8', '7', 'a')) ||
        hasPrefix(bytes, 0, P('G', 'I', 'F', '8', '9', 'a'))) return "image/gif"
    if (hasPrefix(bytes, 0, P('R', 'I', 'F', 'F')) &&
        hasPrefix(bytes, 8, P('W', 'E', 'B', 'P'))) return "image/webp"
    if (hasPrefix(bytes, 0, P('R', 'I', 'F', 'F')) &&
        hasPrefix(bytes, 8, P('W', 'A', 'V', 'E'))) return "audio/wav"
    if (hasPrefix(bytes, 0, P('B', 'M'))) return "image/bmp"
    if (hasPrefix(bytes, 0, P('%', 'P', 'D', 'F', '-'))) return "application/pdf"
    if (hasPrefix(bytes, 0, P(0x1f, 0x8b))) return "application/gzip"
    if (hasPrefix(bytes, 0, P('P', 'K', 0x03, 0x04))) return "application/zip"
    if (hasPrefix(bytes, 0, P('I', 'D', '3'))) return "audio/mpeg"
    if (hasPrefix(bytes, 0, P('O', 'g', 'g', 'S', 0x00))) return "application/ogg"
    if (hasPrefix(bytes, 0, P('w', 'O', 'F', '2'))) return "font/woff2"
    if (bytes.length >= 12 && hasPrefix(bytes, 4, P('f', 't', 'y', 'p'))) return "video/mp4"
    // HTML/XML prescan: skip the standard's leading whitespace, probe tags
    var i = 0
    while (i < bytes.length && i < 1445 &&
           (bytes(i) == 0x09 || bytes(i) == 0x0a || bytes(i) == 0x0c ||
            bytes(i) == 0x0d || bytes(i) == 0x20)) i += 1
    def tagAt(tag: String): Boolean = {
      // case-insensitive ASCII probe followed by a tag terminator
      if (i + tag.length >= bytes.length) return false
      var j = 0
      while (j < tag.length) {
        val c = bytes(i + j) & 0xff
        val t = tag.charAt(j)
        val lc = if (c >= 'A' && c <= 'Z') c + 32 else c
        val lt = if (t >= 'A' && t <= 'Z') t + 32 else t.toInt
        if (lc != lt) return false
        j += 1
      }
      val nxt = at(bytes, i + tag.length)
      nxt == ' ' || nxt == '>' || nxt == '\t' || nxt == '\n' || nxt == '\r' || nxt == '/'
    }
    if (Seq("<!DOCTYPE HTML", "<HTML", "<HEAD", "<SCRIPT", "<IFRAME", "<H1",
            "<DIV", "<FONT", "<TABLE", "<A", "<STYLE", "<TITLE", "<B",
            "<BODY", "<BR", "<P", "<!--").exists(tagAt)) return "text/html"
    if (hasPrefix(bytes, i, P('<', '?', 'x', 'm', 'l'))) return "text/xml"
    // UTF BOMs are text by definition
    if (hasPrefix(bytes, 0, P(0xef, 0xbb, 0xbf)) ||
        hasPrefix(bytes, 0, P(0xfe, 0xff)) ||
        hasPrefix(bytes, 0, P(0xff, 0xfe))) return "text/plain"
    // text-vs-binary fallback over the standard's window
    val n = math.min(bytes.length, 1445)
    var k = 0
    while (k < n) {
      val c = bytes(k) & 0xff
      if (c <= 0x08 || c == 0x0b || (c >= 0x0e && c <= 0x1a) ||
          (c >= 0x1c && c <= 0x1f)) return "application/octet-stream"
      k += 1
    }
    "text/plain"
  }

  def sniffUTF8(bytes: Array[Byte]): UTF8String = {
    val r = sniff(bytes)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Column form — codegen'd native expression over a binary column. */
  def mimeOf(bytes: Column): Column =
    graft.plans.MimeSniffExpression.mimeOf(bytes)
}
