package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document assembly: turn a keyed event log into one ordered text document
  * per key — the step that builds conversation/session training documents
  * out of interaction logs.
  *
  * `collect_list` gives no ordering guarantee under Spark's execution
  * model (partition arrival order varies run to run), so the pieces are
  * collected as (orderKey..., piece) structs and sorted INSIDE the row with
  * `array_sort` — deterministic for any execution, at the price of holding
  * one key's document in memory, which is the same bound any per-key
  * assembly has. One shuffle, on the key. The order key must be unique per
  * row (pass a tiebreaker column) or the output is undefined where it ties.
  */
object Assembly {

  /** One row per key: (key, n_pieces, doc). Pieces are `pieceCol` values
    * joined by `sep` in ascending (orderCols...) order. */
  def assemble(df: DataFrame, keyCol: String, orderCols: Seq[String],
               pieceCol: String, sep: String = " "): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val fields = orderCols.map(c => col(s"`$c`")) :+ col(s"`$pieceCol`").as("__piece")
    df.groupBy(col(s"`$keyCol`").as("key"))
      .agg(count(lit(1)).as("n_pieces"),
        array_sort(collect_list(struct(fields: _*))).as("__sorted"))
      .select(col("key"), col("n_pieces"),
        array_join(transform(col("__sorted"), x => x.getField("__piece")), sep).as("doc"))
  }
}
