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

  /** Write `df` as `slices` single-file parquets covering equal
    * EVENT-TIME ranges, modification times ascending — a deterministic
    * multi-micro-batch replay feed for file-source streams: with
    * `maxFilesPerTrigger=1` each slice becomes one micro-batch, so the
    * event-time watermark genuinely ADVANCES between batches (the
    * single-file AvailableNow shape delivers everything in one batch and
    * never exercises watermark-driven emission mid-stream). Used by the
    * outer-join / state-scale paths; slices are disjoint ts ranges, so
    * the replay has no cross-batch disorder. */
  def writeTimeSliced(df: DataFrame, tsCol: String, dirPath: String, slices: Int): Unit = {
    require(slices >= 1, "need at least one slice")
    val dir = new java.io.File(dirPath)
    dir.mkdirs()
    val src = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ts = unix_timestamp(col(s"`$tsCol`"))
    val Array(minTs, maxTs) = src.agg(min(ts), max(ts) + 1)
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val span = math.max(1L, (maxTs - minTs) / slices + 1)
    (0 until slices).foreach { i =>
      val tmp = new java.io.File(dir, s"_tmp$i")
      src.where(ts >= minTs + i * span && ts < minTs + (i + 1) * span)
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"slice$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
      dst.setLastModified(1000000000000L + i * 60000L)
    }
    src.unpersist(false)
  }
}
