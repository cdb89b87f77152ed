package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share a long
  * word n-gram with an evaluation set — the published GPT-3/PaLM-style
  * procedure (n-gram collision against the benchmark, typically n in 8..13).
  *
  * Scale shape: the benchmark side is SMALL (eval suites are thousands of
  * documents), the corpus side is the 100 TB one. So: build the DISTINCT
  * benchmark n-gram set and BROADCAST it; the corpus side explodes its
  * grams (narrow) and probes the broadcast in an equi-join — no shuffle of
  * corpus data at all until the final distinct over contaminated doc ids
  * (tiny). Matching is exact string equality, so there are no hash-
  * collision false positives. (If the benchmark gram set ever outgrew the
  * broadcast threshold, swap the probe for a `xxhash64` key set — a
  * collision can only over-flag, never miss.)
  */
object Decontamination {

  private def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Distinct ids of documents sharing at least one word `n`-gram with any
    * benchmark text. Tokenization: lowercased whitespace tokens (matches
    * [[TextAnalysis.tokens]]). */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      benchmark: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    require(n >= 2, "n-gram decontamination needs n >= 2")
    val benchGrams = benchmark
      .select(explode(grams(TextAnalysis.tokens(col(s"`$benchTextCol`")), n)).as("gram"))
      .distinct()
    val docGrams = docs.select(
      col(s"`$idCol`").cast("long").as("doc_id"),
      explode(grams(TextAnalysis.tokens(col(s"`$textCol`")), n)).as("gram"))
    // exact string equality in the join condition; broadcast the small side
    docGrams.join(broadcast(benchGrams), "gram")
      .select(col("doc_id")).distinct()
  }

  /** Drop contaminated documents (left anti join against the flagged ids —
    * the id set is small, so the anti join broadcasts too). */
  def dropContaminated(docs: DataFrame, idCol: String, textCol: String,
                       benchmark: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val bad = contaminatedIds(docs, idCol, textCol, benchmark, benchTextCol, n)
    docs.join(broadcast(bad),
      docs(s"`$idCol`").cast("long") === bad("doc_id"), "left_anti")
  }
}
