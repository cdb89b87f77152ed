package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the "never shuffle this join again" path.
  *
  * A fact-dimension (or fact-fact) join that recurs across many queries
  * should not pay its shuffle every time. Writing both sides bucketed AND
  * sorted by the join key lets Spark plan a SortMergeJoin with ZERO
  * Exchange and ZERO per-query Sort: each bucket pair joins locally. (Spark
  * trusts the on-disk sort order only when a bucket holds a single file —
  * write with one task per bucket, as the write-time bucket-hash shuffle
  * does here, or expect a cheap local re-sort, never a shuffle.) At
  * 100 TB this converts the dominant network cost of the pipeline's hot
  * join into a one-time write-side cost that every later query amortizes.
  *
  * Both sides must use the SAME bucket count and key; Spark's bucketing
  * rules then align bucket i with bucket i. (With different counts Spark
  * falls back to shuffling the smaller-bucketed side.)
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). One-time
    * shuffle-by-bucket-hash at write time, then never again.
    *
    * A managed-table location left behind by a PREVIOUS session (catalog
    * gone, directory still on disk) is invisible to DROP TABLE and makes
    * overwrite fail with LOCATION_ALREADY_EXISTS — clear both first. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    if (mode == "overwrite") {
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket key. The returned
    * plan contains no Exchange for either side — verify with
    * `assertNoShuffle` in tests or `.explain` in production. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True when the executed plan contains no shuffle exchange — the
    * property bucketing exists to buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
