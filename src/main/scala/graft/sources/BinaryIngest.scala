package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-corpus ingestion over Spark's built-in `binaryFile` source — the
  * layout image/audio/video training corpora actually arrive in: one object
  * per asset, the id in the key, billions of objects.
  *
  * Scale shape: `binaryFile` scans parallelize per file after listing;
  * `pathGlobFilter` prunes non-matching objects at LISTING time (never
  * opened), and `spark.sql.files.maxPartitionBytes` packs small assets
  * many-per-task so a billion 50 KB images doesn't mean a billion tasks.
  * The cluster-side caveat is the listing itself: a single flat 100 TB
  * prefix lists on the driver — real deployments shard ingestion by prefix
  * (one `readBinaryFiles` per date/shard prefix, unioned) or maintain a
  * manifest table; both compose with this reader unchanged. Content bytes
  * never shuffle here — every downstream decode/feature step is a narrow
  * per-row map, so the scan's partitioning carries through.
  */
object BinaryIngest {

  /** Distributed write of per-row binary payloads as individual
    * `<id><suffix>` files — each task writes its own partition's rows (no
    * driver collect, no single-writer bottleneck). `overwrite` clears the
    * directory first so stale objects from a previous (larger) run cannot
    * leak into a later scan's glob. Local-fs implementation of the
    * object-store PUT pattern; the reader side is layout-identical. */
  def writeFiles(df: DataFrame, idCol: String, contentCol: String,
                 dir: String, suffix: String, overwrite: Boolean = true): Unit = {
    val root = new java.io.File(dir)
    if (overwrite && root.exists()) {
      def rm(f: java.io.File): Unit = {
        // listFiles() is null on an I/O error, not empty — guard the NPE
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
    }
    root.mkdirs()
    // rows with a null id or null payload are dropped BEFORE the write (a
    // null would otherwise NPE inside an executor task and fail the job
    // through a retry storm); an ingest that must account for nulls should
    // validate upstream — this writer's contract is one object per
    // non-null (id, content) row
    df.select(col(s"`$idCol`").cast("long"), col(s"`$contentCol`"))
      .where(col(s"`$idCol`").isNotNull && col(s"`$contentCol`").isNotNull)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val p = java.nio.file.Paths.get(dir, s"${r.getLong(0)}$suffix")
          java.nio.file.Files.write(p, r.getAs[Array[Byte]](1))
        }
      }
  }

  /** `binaryFile` scan of a directory: `(media_id, length, content)` with
    * the numeric id recovered from the object key (filename stem). The
    * glob is pushed to the listing; paths that don't match are never
    * opened. NB Spark's file listing drops ZERO-byte objects — an empty
    * asset never surfaces (spec-pinned); corpora that must account for
    * empties need a manifest-side count, not this scan. */
  def readBinaryFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.[^/.]+$", 1).cast("long").as("media_id"),
        col("length"),
        col("content"))
}
