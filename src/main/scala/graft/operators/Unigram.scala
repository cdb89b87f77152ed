package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer TRAINING — the
  * second of the two standard subword trainers next to [[Bpe.train]]
  * (Kudo 2018, "Subword Regularization: Improving Neural Network
  * Translation Models with Multiple Subword Candidates" — the public
  * algorithm: seed a large candidate vocabulary, alternate an EM step
  * that re-segments the corpus under the current model with a PRUNE step
  * that drops the pieces whose removal costs the least likelihood, until
  * the target vocabulary size is reached).
  *
  * Engine-portable objective: the published trainer scores segmentations
  * by float log-likelihood, which no oracle can replay bit-for-bit
  * across engines. This trainer uses the repo's established integer
  * objective instead ([[Segment.viterbiSegment]]'s): a segmentation's
  * cost is its TOKEN COUNT, ties broken by the longest final token at
  * every DP cell — the same deterministic Viterbi the `segment_viterbi`
  * oracle already replays in DuckDB. The EM/prune structure is Kudo's;
  * the arithmetic is exact integers:
  *   - E-step: Viterbi-segment every distinct word under the current
  *     vocabulary ([[graft.plans.ViterbiKernel]], the codegen'd kernel);
  *     usage(x) = Σ_word freq(word) · occurrences of x in the word's
  *     segmentation (hard-EM counts — Kudo §3.2's Viterbi approximation
  *     of the full forward–backward expectations).
  *   - Prune loss: removing piece x forces each of its occurrences to
  *     re-segment; because x can never appear strictly inside its own
  *     span, min-cost-without-x(x) = min over split points i of
  *     cost(x[0,i)) + cost(x[i,len)) with both halves segmented under
  *     the FULL vocabulary — computed exactly, driver-side, on the
  *     vocab-sized piece set. loss(x) = usage(x) · (altCost(x) − 1):
  *     the corpus-weighted extra tokens x's removal would cost (the
  *     integer-grid analogue of Kudo's likelihood drop).
  *   - Shrink schedule: each round keeps the top pieces by (loss DESC,
  *     usage DESC, token ASC) — max(target, 3/4 of current) per round,
  *     cutting straight to target on the last round (Kudo's default
  *     shrinking_factor=0.75 loop, made a fixed round count so the
  *     whole trajectory is replayable).
  *
  * Scale shape, exactly [[Bpe.train]]'s: the corpus is scanned ONCE into
  * the word-frequency histogram (Heaps'-law sublinear); every round then
  * runs one vocab-broadcast Viterbi pass over the DISTINCT-WORD frame
  * (map-side combined usage aggregate, vocab-sized result to the driver
  * — the driver must hold the vocabulary anyway to build the next
  * round's kernel) plus a driver-side DP over the piece strings
  * (≤ seedSize pieces of ≤ maxPieceLen chars — microseconds). Nothing
  * corpus-sized ever shuffles or collects.
  *
  * Output: (rank, token, piece_len, usage) over the FINAL vocabulary
  * (single characters always kept, the published invariant), usage from
  * a final E-step, rank by (usage DESC, token ASC).
  */
object Unigram {

  /** Min-token-count DP cost of `word` under `vset` — the cost half of
    * [[graft.plans.ViterbiKernel]]'s cell rule (the cost value is unique;
    * the tie rule only disambiguates the backtrack, which altCost never
    * needs). Int.MaxValue−1 = unreachable. */
  private def minToksCost(word: String, vset: java.util.HashSet[String],
                          maxTokLen: Int): Int = {
    val n = word.length
    val Unreachable = Int.MaxValue - 1
    val cost = Array.fill(n + 1)(Unreachable)
    cost(0) = 0
    var j = 1
    while (j <= n) {
      val lMax = math.min(j, maxTokLen)
      var l = 1
      while (l <= lMax) {
        if (cost(j - l) != Unreachable && vset.contains(word.substring(j - l, j))) {
          val c = cost(j - l) + 1
          if (c < cost(j)) cost(j) = c
        }
        l += 1
      }
      j += 1
    }
    cost(n)
  }

  /** Exact min cost of segmenting piece `x` WITHOUT itself: best split
    * point with both halves under the full vocabulary (a proper
    * substring can never be x, so the full-vocab half costs equal the
    * without-x costs). */
  private def altCost(x: String, vset: java.util.HashSet[String],
                      maxTokLen: Int,
                      memo: scala.collection.mutable.HashMap[String, Int]): Int = {
    def cost(s: String): Int =
      memo.getOrElseUpdate(s, minToksCost(s, vset, maxTokLen))
    (1 until x.length).map(i => cost(x.substring(0, i)) + cost(x.substring(i))).min
  }

  /** Train a unigram-LM vocabulary of `vocabSize` total pieces (single
    * characters included and always kept) over `textCol`'s `wordPattern`
    * words. `seedSize` bounds the candidate pieces (top substrings of
    * 2..`maxPieceLen` chars by corpus-frequency × length, occurrences
    * counted with multiplicity, min corpus frequency `minFreq`);
    * `rounds` EM/prune rounds shrink the candidates to target. Words
    * longer than `maxWordLen` are dropped from the histogram (the
    * [[Segment.viterbiSegment]] convention). */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            seedSize: Int = 1000, maxPieceLen: Int = 8, rounds: Int = 1,
            minFreq: Long = 2L, maxWordLen: Int = 20,
            wordPattern: String = Bpe.AsciiWords): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(seedSize >= 1 && seedSize <= 65536, "seedSize in [1, 65536]")
    require(maxPieceLen >= 2 && maxPieceLen <= 16, "maxPieceLen in [2, 16]")
    require(rounds >= 1 && rounds <= 16, "rounds in [1, 16]")
    require(maxWordLen >= 1 && maxWordLen <= 64, "maxWordLen in [1, 64]")
    val spark = df.sparkSession

    // ---- the one corpus scan: word-frequency histogram ----
    val hist = df.select(explode(filter(
        split(lower(trim(col(s"`$textCol`"))), "\\s+"),
        w => w.rlike(wordPattern))).as("word"))
      .where(length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .localCheckpoint(true) // reused every round; lineage truncated once

    // ---- alphabet: single characters are permanent vocabulary ----
    val chars = hist.select(explode(transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("c"))
      .distinct().collect().map(_.getString(0)).sorted
    require(chars.nonEmpty, "unigram train: no words matched the pattern")
    require(chars.length <= 4096, s"alphabet too large: ${chars.length}")
    require(vocabSize >= chars.length,
      s"vocabSize ($vocabSize) must cover the ${chars.length}-char alphabet")
    val targetMulti = vocabSize - chars.length

    // ---- seeding: top substrings by corpus frequency × length ----
    // every 2..maxPieceLen window of every word occurrence (multiplicity
    // counted — Kudo seeds from the suffix-array frequent substrings;
    // this is the same statistic on bounded window lengths)
    val seeds = hist.select(col("freq"), explode(flatten(transform(
        sequence(lit(2), lit(maxPieceLen)),
        l => when(length(col("word")) >= l,
          transform(sequence(lit(1), length(col("word")) - l + 1),
            i => col("word").substr(i, l)))
          .otherwise(array().cast("array<string>"))))).as("s"))
      .groupBy(col("s")).agg(sum(col("freq")).as("f"))
      .where(col("f") >= minFreq)
      .select(col("s"), (col("f") * length(col("s"))).as("score"))
      .orderBy(col("score").desc, col("s"))
      .limit(seedSize)
      .collect().map(_.getString(0))

    // ---- E-step usage under a given vocabulary (distributed, one
    // vocab-broadcast kernel pass over the distinct-word frame) ----
    def usageOf(vocabArr: Array[String]): Map[String, Long] = {
      val kernelCol = org.apache.spark.sql.GraftBridge.column(
        graft.plans.ViterbiSegmentExpr(
          org.apache.spark.sql.GraftBridge.expression(col("word")),
          new graft.plans.ViterbiKernel(vocabArr, maxWordLen)))
      hist.select(col("freq"), explode(kernelCol).as("tok"))
        .groupBy(col("tok")).agg(sum(col("freq")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    // ---- EM / prune rounds ----
    var multi = seeds
    var r = 1
    while (r <= rounds && multi.length > targetMulti) {
      val vocabArr = chars ++ multi
      val usage = usageOf(vocabArr)
      val vset = new java.util.HashSet[String](vocabArr.length * 2)
      vocabArr.foreach(vset.add)
      val maxTokLen = vocabArr.iterator.map(_.length).max
      val memo = scala.collection.mutable.HashMap.empty[String, Int]
      val scored = multi.map { x =>
        val u = usage.getOrElse(x, 0L)
        val alt = altCost(x, vset, maxTokLen, memo)
        (x, u, u * (alt - 1).toLong)
      }
      val keep =
        if (r == rounds) targetMulti
        else math.max(targetMulti, multi.length * 3 / 4)
      multi = scored
        .sortBy { case (x, u, loss) => (-loss, -u, x) }
        .take(keep).map(_._1)
      r += 1
    }

    // ---- final E-step on the final vocabulary; rank by usage ----
    val finalVocab = chars ++ multi
    val usage = usageOf(finalVocab)
    val rows = finalVocab
      .map(t => (t, usage.getOrElse(t, 0L)))
      .sortBy { case (t, u) => (-u, t) }
      .zipWithIndex
      .map { case ((t, u), i) =>
        org.apache.spark.sql.Row((i + 1).toLong, t, t.length.toLong, u)
      }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    spark.createDataFrame(rows.toSeq.asJava, StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("token", StringType, nullable = false),
      StructField("piece_len", LongType, nullable = false),
      StructField("usage", LongType, nullable = false))))
  }
}
