package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-aware table sinks.
  *
  * The naive `df.write.partitionBy(p).parquet(path)` writes one file per
  * (task x live partition value) — on a 1000-task stage over 100 partition
  * values that is up to 100,000 files per write, the classic small-files
  * explosion that poisons every downstream scan. The fix is to SHUFFLE ON
  * THE PARTITION COLUMNS FIRST so each hive partition's rows are held by a
  * bounded number of tasks, with a salt to keep skewed partition values
  * (one language dominating a corpus) from serializing into one writer.
  */
object Sinks {

  /** Partitioned parquet write producing at most `filesPerPartition` files
    * per partition value (plus Spark's `maxRecordsPerFile` splitting as a
    * size backstop):
    *
    *  - one repartition on (partitionCols, salt) — salt =
    *    `pmod(xxhash64(all row columns), files)` (deterministic, so a
    *    stage retry re-routes every row identically) — rows of one
    *    partition value land on up to `files` tasks regardless of value
    *    skew;
    *  - dynamic overwrite only replaces partitions present in `df`
    *    (idempotent incremental reloads, the behavior a recurring
    *    curation job needs).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 4,
                       maxRecordsPerFile: Long = 5000000L,
                       format: String = "parquet",
                       options: Map[String, String] = Map.empty): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1)
    val keys = partitionCols.map(c => col(s"`$c`"))
    // DETERMINISTIC content salt: monotonically_increasing_id depends on
    // row order within a task, so a fetch-failure retry could recompute a
    // map partition in a different order, route rows to different reducers
    // than the surviving fetches saw, and silently write rows twice or not
    // at all (the SPARK-23207 class of bug) — at exactly the 100 TB scale
    // where retries are routine. Hashing the full row is retry-stable;
    // identical rows co-locating in one file is bounded by the duplicate
    // count and backstopped by maxRecordsPerFile.
    // MapType is not hashable by xxhash64 — exclude such columns from the
    // salt basis (their rows still spread by every other column)
    val hashableCols = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(s"`${f.name}`"))
    val saltBasis = if (hashableCols.nonEmpty) hashableCols.toSeq else keys
    val salt = pmod(xxhash64(saltBasis: _*), lit(filesPerPartition))
    df.repartition((keys :+ salt): _*)
      .write
      .format(format)
      .options(options)
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .save(path)
  }
}
