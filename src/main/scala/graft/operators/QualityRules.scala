package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", §A1.1) —
  * the line-structure and word-shape heuristics that complement
  * [[TextAnalysis.qualityDecision]]'s ratio rules: repetition and
  * punctuation ratios catch noisy text, these catch STRUCTURED junk
  * (navigation menus of bullets, truncated ellipsis farms, symbol soup,
  * all-numeric tables) that has perfectly ordinary character ratios.
  *
  * Every rule is evaluated in INTEGER arithmetic via cross-multiplication
  * (`10 * bullets <= 9 * lines` rather than `bullets / lines <= 0.9`), so
  * the decision is exact, division-free, and bit-identical across engines
  * — the `quality_rules` oracle recomputes every per-document flag in SQL.
  *
  * Scale shape: one narrow codegen'd projection per document — no
  * shuffle, no UDF, no state. At 100 TB this is scan-bound by
  * construction; the rules ride whatever scan the pipeline already pays.
  */
object QualityRules {

  /** The same 7-word stopword set [[TextAnalysis.qualityDecision]] votes
    * with — kept identical so a doc failing `stopword_ok` here fails the
    * stopword bit there. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document rule flags over `textCol`:
    *
    *   - `word_count_ok`   — 3 <= words <= 100000
    *   - `mean_word_len_ok`— mean word length in [3, 10] chars
    *   - `symbol_ok`       — (# '#' + # '…') <= 0.1 * words
    *   - `bullet_ok`       — <= 90% of lines start with '-', '*' or '•'
    *   - `ellipsis_ok`     — <= 30% of lines end with "..." or '…'
    *   - `alpha_ok`        — >= 80% of words contain a letter [a-z]
    *   - `stopword_ok`     — >= 2 distinct Stopwords present
    *   - `pass`            — conjunction of all of the above
    *
    * Words are the lowercased whitespace tokens (empties dropped); lines
    * split on '\n' with empty lines counted (they trivially satisfy the
    * bullet/ellipsis shape, matching the published rules' denominators).
    * Thresholds follow the Gopher paper except the word-count floor
    * (3, not 50 — the floor is corpus policy, not junk detection, and a
    * 50 floor would reject every short synthetic fixture doc; callers
    * wanting the paper's floor filter on `n_words` directly). */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = coalesce(col(s"`$textCol`"), lit(""))
    val words = filter(split(trim(lower(text)), "\\s+"), w => w =!= "")
    val lines = split(text, "\n")
    def charCount(ch: String): Column =
      length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(ch), ""))
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val wordChars = aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val symbols = charCount("#") + charCount("…")
    val bulletLines = size(filter(lines, l =>
      startswith(ltrim(l), lit("-")) || startswith(ltrim(l), lit("*")) ||
        startswith(ltrim(l), lit("•")))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…")))).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val stopwordsPresent = Stopwords
      .map(s => when(array_contains(words, s), 1L).otherwise(0L))
      .reduce(_ + _)

    val wordCountOk = nWords >= 3L && nWords <= 100000L
    val meanLenOk = nWords > 0L && wordChars >= nWords * 3L && wordChars <= nWords * 10L
    val symbolOk = symbols * 10L <= nWords
    val bulletOk = bulletLines * 10L <= nLines * 9L
    val ellipsisOk = ellipsisLines * 10L <= nLines * 3L
    val alphaOk = alphaWords * 5L >= nWords * 4L
    val stopwordOk = stopwordsPresent >= 2L

    df.select(
      col(s"`$idCol`"),
      nWords.as("n_words"),
      nLines.as("n_lines"),
      wordCountOk.as("word_count_ok"),
      meanLenOk.as("mean_word_len_ok"),
      symbolOk.as("symbol_ok"),
      bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"),
      alphaOk.as("alpha_ok"),
      stopwordOk.as("stopword_ok"),
      (wordCountOk && meanLenOk && symbolOk && bulletOk &&
        ellipsisOk && alphaOk && stopwordOk).as("pass"))
  }
}
