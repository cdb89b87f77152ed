package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data assembly: lay documents out along
  * a global token axis (deterministic order), then bin them into fixed
  * token-capacity training sequences.
  *
  * The global prefix sum is computed the SCALABLE way — NOT with a single
  * `Window.orderBy(...)` over the whole frame (which funnels the entire
  * dataset through one task): range-partition on the order key, cumsum
  * per partition with an ordinary partitioned window, then add broadcast
  * per-partition offsets (one row per partition). Wall-clock is one range
  * shuffle + one narrow join; every stage is parallel. This is the classic
  * two-pass distributed prefix sum, expressed in DataFrame ops so Catalyst
  * still prunes/pushes around it.
  *
  * Two packing disciplines are offered, both deterministic and both
  * recomputable in plain SQL window functions by an oracle engine:
  *
  *  - [[assignBins]] — contiguous greedy packing: a document's bin is
  *    `floor(token_start / capacity)`; a document that straddles a capacity
  *    boundary stays in its starting bin (bins may overflow by at most one
  *    document — the bounded-overflow contract used when documents must not
  *    be split).
  *  - [[chunkSpans]] — GPT-style concat-and-chunk: the token stream is cut
  *    at exact capacity multiples; a straddling document belongs to every
  *    chunk its span crosses (`n_chunks` per doc), and the total number of
  *    training sequences is `ceil(total_tokens / capacity)`.
  */
object Packing {

  /** (token_start, token_end] span of every row along the global token axis
    * ordered by `orderCol`, which MUST be unique — duplicates would make
    * span assignment order-dependent, so they raise an error mid-job
    * rather than emit overlapping spans. Adds `token_start`, `token_end`. */
  def tokenSpans(df: DataFrame, orderCol: String, tokensCol: String): DataFrame = {
    val pid = "__graft_pid"
    // range partition => partition i holds an orderCol range entirely below
    // partition i+1, so (pid, orderCol) sorts identically to orderCol alone
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(parallelism, col(s"`$orderCol`"))
      .withColumn(pid, spark_partition_id())
    val localW = Window.partitionBy(pid).orderBy(col(s"`$orderCol`"))
    // ROWS frame, not the default RANGE: RANGE includes orderCol PEERS, so
    // two rows tied on orderCol would both receive the combined end and
    // their spans would OVERLAP. With a ROWS frame ties would instead be
    // silently order-dependent — so duplicates fail loudly via the lag
    // guard below (range partitioning co-locates equal keys, so the
    // within-partition lag sees every duplicate pair).
    val cum = sum(col(s"`$tokensCol`"))
      .over(localW.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val dupGuard = when(
      lag(col(s"`$orderCol`"), 1).over(localW) === col(s"`$orderCol`"),
      raise_error(concat(lit("tokenSpans requires a UNIQUE orderCol; duplicate value: "),
        col(s"`$orderCol`").cast("string"))).cast("long")).otherwise(lit(0L))
    // persisted: both the offsets branch and the result consume this frame —
    // without the persist each consumer re-runs the scan + range shuffle +
    // window (the plan tree duplicates the whole subtree); released lazily
    // after the caller's first action
    val local = ranged.withColumn("__local_end", cum + dupGuard)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per partition; the offset window runs over <=parallelism rows
    val offsetW = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(pid))
      .agg(max(col("__local_end")).as("__ptotal"))
      .withColumn("__offset", coalesce(sum(col("__ptotal")).over(offsetW), lit(0L)))
      .select(col(pid), col("__offset"))
    Partitioning.releaseAfterUse(
      local.join(broadcast(offsets), pid)
        .withColumn("token_end", col("__local_end") + col("__offset"))
        .withColumn("token_start", col("token_end") - col(s"`$tokensCol`"))
        .drop(pid, "__local_end", "__offset"),
      local)
  }

  /** Contiguous greedy packing: adds `bin` = floor(token_start / capacity).
    * Every bin holds consecutive documents; fill is in
    * (capacity - max_doc_tokens, capacity + max_doc_tokens). */
  def assignBins(df: DataFrame, orderCol: String, tokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    tokenSpans(df, orderCol, tokensCol)
      .withColumn("bin", floor(col("token_start") / capacity).cast("long"))
  }

  /** Concat-and-chunk spans: adds `chunk_first`, `chunk_last`, `n_chunks`
    * (how many capacity-sized training sequences this document's tokens
    * touch). Zero-token documents touch zero chunks. */
  def chunkSpans(df: DataFrame, orderCol: String, tokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val first = floor(col("token_start") / capacity).cast("long")
    val last = floor((col("token_end") - 1) / capacity).cast("long")
    tokenSpans(df, orderCol, tokensCol)
      .withColumn("chunk_first", when(col(s"`$tokensCol`") > 0, first))
      .withColumn("chunk_last", when(col(s"`$tokensCol`") > 0, last))
      .withColumn("n_chunks",
        when(col(s"`$tokensCol`") > 0, last - first + 1).otherwise(lit(0L)))
  }
}
