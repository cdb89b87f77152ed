package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language identification by profile ranking — the
  * Cavnar–Trenkle (1994, "N-Gram-Based Text Categorization") out-of-place
  * measure, the public method behind most classic langid tools.
  *
  * Each language carries a PROFILE: its `profileSize` most frequent
  * character 1..5-grams (tokens lowercased and padded with `_`), ranked.
  * A document is classified by building its own top-`profileSize` gram
  * ranking the same way and summing, over the document's grams, the rank
  * displacement against each language profile (a gram absent from the
  * profile costs the maximum, `profileSize`); the language with the
  * smallest total distance wins, ties broken by language code. Ranking
  * is gated to the dominant script's candidate set first
  * ([[candidates]]) so Latin boilerplate inside CJK/Cyrillic/Arabic
  * pages cannot outvote the body.
  *
  * Profiles are built ONCE per JVM from snippet resources committed at
  * `graft/langid/<code>.txt` (original sample text written for this
  * repository — the method needs only a few hundred words per language)
  * and live as plain maps: per-row classification is a bounded local
  * kernel (input capped at [[maxChars]], so cost per row is O(1) at any
  * corpus scale) invoked from a codegen'd Catalyst expression
  * ([[graft.plans.LangIdExpr]]) — one static call inside whole-stage
  * codegen, no UDF, no serialization of the profiles into task closures.
  *
  * This replaces the 5-language stopword-marker heuristic
  * ([[TextAnalysis.languageId]], kept for back-compat in `text_profile`)
  * with a method that separates same-script neighbors (es/pt, sv/da)
  * because it ranks the whole subword distribution rather than counting
  * a handful of marker words.
  */
object LangId {

  /** Classic Cavnar–Trenkle profile length. */
  val profileSize = 300

  /** Per-row input cap: C–T saturates after a few hundred grams, so
    * classifying a 10 MB document must not cost 10 MB of gramming. */
  val maxChars = 4000

  /** 11 Latin-script languages plus the six major non-Latin scripts
    * (verdict r17 ask #2): the method is char-level already, so CJK/
    * Cyrillic/Arabic/Devanagari need only committed snippet resources —
    * hanzi/kana/hangul unigrams separate ja-vs-zh-vs-ko, and ja-vs-zh
    * (the same-script-family pair) falls to kana grams plus the
    * distribution shift between Japanese-frequent and Chinese-frequent
    * characters. Sorted: code order IS the deterministic tie-break. */
  val languages: Seq[String] =
    Seq("ar", "da", "de", "en", "es", "fr", "hi", "it", "ja", "ko",
      "nl", "pl", "pt", "ru", "sv", "tr", "zh")

  /** Top-`profileSize` grams of `text`, ranked 0..k-1 by (count desc,
    * gram asc) — the deterministic tie-break matters: profile order is
    * part of observable behavior. */
  private[operators] def profile(text: String): java.util.HashMap[String, Integer] = {
    val counts = new java.util.HashMap[String, Integer]()
    val s = if (text.length > maxChars) text.substring(0, maxChars) else text
    val token = new java.lang.StringBuilder("_")
    def flush(): Unit = {
      if (token.length() > 1) {
        token.append('_')
        val t = token.toString
        var n = 1
        while (n <= 5) {
          var i = 0
          while (i + n <= t.length) {
            counts.merge(t.substring(i, i + n), 1, (a, b) => a + b)
            i += 1
          }
          n += 1
        }
      }
      token.setLength(1)
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) token.append(Character.toLowerCase(c)) else flush()
      i += 1
    }
    flush()
    val ranked = new java.util.ArrayList[java.util.Map.Entry[String, Integer]](counts.entrySet())
    ranked.sort { (a, b) =>
      val byCount = Integer.compare(b.getValue, a.getValue)
      if (byCount != 0) byCount else a.getKey.compareTo(b.getKey)
    }
    val top = new java.util.HashMap[String, Integer]()
    var r = 0
    while (r < ranked.size() && r < profileSize) {
      top.put(ranked.get(r).getKey, r)
      r += 1
    }
    top
  }

  /** Candidate-language gating by dominant script (the CLD2 move,
    * simplified: segment-by-script, score within script). Web text mixes
    * scripts constantly — CJK/Cyrillic/Arabic pages carry Latin
    * boilerplate, product names, URLs — and raw gram ranking lets a
    * Latin tail outvote a shorter non-Latin body because its grams
    * overlap SOME Latin profile while hanzi 2..5-grams rarely recur
    * enough to hit the zh profile. Letters are counted per script with
    * CJK weighted 4x (a hanzi char is a morpheme, a kana/hangul char a
    * syllable; a Latin char is ~1/5 word), and only the dominant
    * script's languages are ranked. Han and kana share a bucket (ja
    * text interleaves them; the ranker separates ja-vs-zh inside the
    * bucket). Unrecognized-script or letterless text falls back to the
    * full set. */
  private[operators] def candidates(s: String): java.util.Set[String] = {
    var latin = 0L; var cjk = 0L; var hangul = 0L
    var cyr = 0L; var arab = 0L; var deva = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        import Character.UnicodeScript
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN => latin += 1
          case UnicodeScript.HAN | UnicodeScript.HIRAGANA |
               UnicodeScript.KATAKANA => cjk += 4
          case UnicodeScript.HANGUL => hangul += 4
          case UnicodeScript.CYRILLIC => cyr += 1
          case UnicodeScript.ARABIC => arab += 1
          case UnicodeScript.DEVANAGARI => deva += 1
          case _ => ()
        }
      }
      i += Character.charCount(cp)
    }
    // fixed evaluation order + strict > keeps the pick deterministic
    val buckets: Array[(Long, Array[String])] = Array(
      latin -> Array("da", "de", "en", "es", "fr", "it", "nl", "pl",
        "pt", "sv", "tr"),
      cjk -> Array("ja", "zh"),
      hangul -> Array("ko"),
      cyr -> Array("ru"),
      arab -> Array("ar"),
      deva -> Array("hi"))
    var best = -1
    var bestW = 0L
    var b = 0
    while (b < buckets.length) {
      if (buckets(b)._1 > bestW) { bestW = buckets(b)._1; best = b }
      b += 1
    }
    val out = new java.util.HashSet[String]()
    if (best < 0) languages.foreach(out.add) else buckets(best)._2.foreach(out.add)
    out
  }

  /** language code -> ranked gram profile, loaded once per JVM. */
  private lazy val profiles: Array[(String, java.util.HashMap[String, Integer])] =
    languages.map { code =>
      val in = Thread.currentThread().getContextClassLoader
        .getResourceAsStream(s"graft/langid/$code.txt")
      require(in != null, s"missing language profile resource graft/langid/$code.txt")
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      code -> profile(text)
    }.toArray

  /** Out-of-place distance of a doc profile against a language profile. */
  private def distance(doc: java.util.HashMap[String, Integer],
                       lang: java.util.HashMap[String, Integer]): Long = {
    var d = 0L
    val it = doc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val lr = lang.get(e.getKey)
      d += (if (lr == null) profileSize.toLong else math.abs(e.getValue - lr.intValue()).toLong)
    }
    d
  }

  /** Predicted language code, or null when the text holds no letters.
    * Deterministic argmin; `languages` is sorted, so "first smallest
    * distance wins" IS the code-order tie-break. */
  def classify(text: String): String = {
    if (text == null) return null
    val s = if (text.length > maxChars) text.substring(0, maxChars) else text
    val doc = profile(s)
    if (doc.isEmpty) return null
    val cand = candidates(s)
    var bestCode: String = null
    var bestDist = Long.MaxValue
    var i = 0
    while (i < profiles.length) {
      val (code, p) = profiles(i)
      if (cand.contains(code)) {
        val d = distance(doc, p)
        if (d < bestDist) { bestDist = d; bestCode = code }
      }
      i += 1
    }
    bestCode
  }

  /** Static entry point for generated code (UTF8String in/out). */
  def classifyUTF8(text: UTF8String): UTF8String = {
    val r = classify(if (text == null) null else text.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Column API: `langid(col("text"))`. */
  def langid(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.LangIdExpr(org.apache.spark.sql.GraftBridge.expression(text)))
}
