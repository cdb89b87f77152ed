package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL-seen frontier store — THE data structure of a continuous crawl:
  * "have we fetched this URL before?" asked for every discovered URL
  * against billions of already-crawled ones. Exact set semantics with a
  * Bloom-prefiltered probe (the decontamination discipline applied to
  * the frontier):
  *
  *  - STORE: distinct canonical urls ([[UrlDomain.canonicalizeUrl]] —
  *    the same key url-level dedup uses), parquet-partitioned by
  *    `chunk = xxhash64(canon) % 64`, plus a Bloom sidecar (`_bloom`,
  *    ~10 bits/key at the default fpp) built from the same frame. The
  *    Bloom CAPACITY is a declared store parameter: batches build
  *    same-shaped filters, so [[markSeen]] can OR them into the sidecar
  *    (Spark blooms merge only at identical bit size). Exceeding
  *    capacity degrades the filter's fpp, never correctness — the
  *    confirm join is exact.
  *  - PROBE ([[novelUrls]]): the batch canonicalizes in-row and tests
  *    the Bloom first via the codegen'd
  *    [[graft.plans.BloomExpression]] probe. Bloom-negative urls are
  *    DEFINITELY novel (a Bloom never misses) — the ~all-of-batch fast
  *    path with zero store I/O. Only bloom-positive urls (truly seen +
  *    ~fpp false positives) go to the exact confirm join, BROADCAST
  *    against ONE store scan: the store is never shuffled, never
  *    grouped, and the novel set is EXACT.
  *
  * Cost per probe: O(batch) in-row work + one store scan with
  * match-sized output — independent of how many probes ran before;
  * [[markSeen]] appends the batch and ORs its Bloom, so the frontier
  * grows without ever rewriting history. */
object Frontier {

  val Chunks = 64
  private val BloomFile = "_bloom"

  /** (canon, chunk) — canonicalized, null-hostless dropped, distinct. */
  private[operators] def canonChunks(urls: DataFrame, urlCol: String): DataFrame =
    urls.select(UrlDomain.urlCanonical(col(s"`$urlCol`")).as("canon"))
      .where(col("canon").isNotNull)
      .distinct()
      .withColumn("chunk", pmod(xxhash64(col("canon")), lit(Chunks.toLong)))

  private def bloomOf(df: DataFrame, capacity: Long, fpp: Double) = {
    if (df.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(capacity, fpp)
    else df.stat.bloomFilter("canon", capacity, fpp)
  }

  private def writeBloom(spark: SparkSession, path: String,
                         bloom: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val p = new org.apache.hadoop.fs.Path(path, BloomFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }

  private def readBloom(spark: SparkSession, path: String): org.apache.spark.util.sketch.BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(path, BloomFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }

  /** Build the store from an already-crawled url frame. */
  def writeSeenStore(urls: DataFrame, urlCol: String, path: String,
                     capacity: Long = 4000000L, fpp: Double = 0.01,
                     filesPerPartition: Int = 1): Unit = {
    require(capacity >= 1, "capacity must be positive")
    val c = canonChunks(urls, urlCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      graft.sources.Sinks.writePartitioned(c, path, Seq("chunk"), filesPerPartition)
      writeBloom(urls.sparkSession, path, bloomOf(c, capacity, fpp))
    } finally c.unpersist(blocking = false)
  }

  /** Append a batch to the store and OR its Bloom into the sidecar.
    * Re-adding an already-seen url is harmless (the store is a SET:
    * probes join on canon equality — duplicate rows only cost bytes;
    * callers feed [[novelUrls]] output to keep it tight). The batch
    * Bloom must be built at the SAME (capacity, fpp) as the store's. */
  def markSeen(path: String, urls: DataFrame, urlCol: String,
               capacity: Long = 4000000L, fpp: Double = 0.01): Unit = {
    val spark = urls.sparkSession
    val c = canonChunks(urls, urlCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      // Bloom FIRST, parquet second: a crash between the two writes must
      // leave bloom ⊇ store. The reverse order (advisor r17) would leave
      // store rows the Bloom never saw, and novelUrls treats
      // bloom-negative as definitely-novel with zero store I/O — those
      // urls would be re-reported novel forever. Bloom-without-rows only
      // costs false positives, which the exact confirm join absorbs.
      val merged = readBloom(spark, path).mergeInPlace(bloomOf(c, capacity, fpp))
      writeBloom(spark, path, merged)
      c.write.mode("append").partitionBy("chunk").parquet(path)
    } finally c.unpersist(blocking = false)
  }

  /** EXACT novel set of a batch against the store: canonical urls of the
    * batch that the crawl has never seen. One store scan, store never
    * shuffled; bloom-negatives short-circuit with zero store I/O. */
  def novelUrls(spark: SparkSession, path: String, batch: DataFrame,
                urlCol: String): DataFrame = {
    val bloom = readBloom(spark, path)
    val b = canonChunks(batch, urlCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val hit = graft.plans.BloomExpression.mightContain(col("canon"), bloom)
    val definitelyNovel = b.where(!hit).select(col("canon"))
    val maybeSeen = b.where(hit)
    // explicit schema: a store written from zero urls has no parquet
    // files to infer from, and an empty frontier is a legal day-0 state
    val store = spark.read.schema("canon STRING, chunk BIGINT").parquet(path)
    val confirmedSeen = store.join(broadcast(maybeSeen), Seq("chunk", "canon"))
      .select(col("canon")).distinct()
    val novelOfMaybe = maybeSeen.select(col("canon"))
      .join(broadcast(confirmedSeen), Seq("canon"), "left_anti")
    Partitioning.releaseAfterUse(
      definitelyNovel.unionByName(novelOfMaybe), b)
  }
}
