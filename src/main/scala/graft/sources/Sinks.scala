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
    *    `pmod(xxhash64(all partition cols, monotonic row id), files)` —
    *    so rows of one partition value land on exactly `files` tasks,
    *    regardless of value skew;
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
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(filesPerPartition))
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
