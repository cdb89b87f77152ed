package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CdcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def bytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  private def sizes(data: Array[Byte], min: Int = 256, normal: Int = 1024,
                    max: Int = 4096): Array[Int] = {
    val cuts = Cdc.boundaries(data, min, normal, max)
    var start = 0
    cuts.map { c => val s = c - start; start = c; s }
  }

  test("partition law: contiguous cover, bounds respected") {
    val data = bytes(100000, 1L)
    val cuts = Cdc.boundaries(data, 256, 1024, 4096)
    assert(cuts.last === data.length)
    assert(cuts.sorted.sameElements(cuts))
    val ss = sizes(data)
    assert(ss.sum === data.length)
    assert(ss.forall(_ <= 4096))
    assert(ss.dropRight(1).forall(_ > 256)) // only the final chunk may be small
  }

  test("size distribution centers near normalSize") {
    val data = bytes(262144, 2L)
    val ss = sizes(data)
    val avg = ss.sum.toDouble / ss.length
    assert(avg > 1024 / 3.0 && avg < 3 * 1024.0, s"avg chunk $avg")
  }

  test("determinism") {
    val data = bytes(50000, 3L)
    assert(Cdc.boundaries(data, 256, 1024, 4096)
      .sameElements(Cdc.boundaries(data, 256, 1024, 4096)))
  }

  test("resynchronization: a prefix change realigns within the shared run") {
    val shared = bytes(30000, 4L)
    val a = bytes(137, 5L) ++ shared
    val b = bytes(731, 6L) ++ shared
    def hashes(d: Array[Byte]): Array[Long] = {
      val cuts = Cdc.boundaries(d, 256, 1024, 4096)
      var start = 0
      cuts.map { c => val h = Cdc.fnv1a64(d, start, c - start); start = c; h }
    }
    val ha = hashes(a)
    val hb = hashes(b)
    // boundaries realign: the two chunkings share their trailing chunks
    assert(ha.last === hb.last)
    val common = ha.toSet.intersect(hb.toSet).size
    assert(common >= ha.length / 2, s"only $common shared of ${ha.length}")
  }

  test("fixed-size chunking would NOT resync (the reason CDC exists)") {
    val shared = bytes(30000, 4L)
    val a = bytes(137, 5L) ++ shared
    val b = bytes(731, 6L) ++ shared
    def fixedHashes(d: Array[Byte]): Set[Long] =
      d.grouped(1024).map(g => Cdc.fnv1a64(g, 0, g.length)).toSet
    // 137 vs 731 prefix shift: no 1024-aligned window coincides
    assert(fixedHashes(a).intersect(fixedHashes(b)).size <= 1)
  }

  test("edge cases: empty, tiny, exactly-min inputs") {
    assert(Cdc.boundaries(Array.emptyByteArray, 256, 1024, 4096).isEmpty)
    assert(sizes(bytes(10, 7L)) === Array(10))
    assert(sizes(bytes(256, 8L)) === Array(256))
    assert(sizes(bytes(257, 9L)).sum === 257)
  }

  test("chunk store: exact novelty, append correctness, idempotent re-ingest") {
    import spark.implicits._
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"cdc_store_spec_${System.nanoTime()}").getAbsolutePath
    def frame(hs: (Long, Long)*) = hs.toSeq.toDF("hash", "size")
    Cdc.writeChunkStore(frame(1L -> 100L, 2L -> 200L, 65L -> 300L), path)
    // 65 % 64 == 1 % 64: same store partition, distinct hashes must both live
    val novel = Cdc.ingestNovel(spark, path, frame(2L -> 200L, 3L -> 50L, 129L -> 70L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(novel.toSeq === Seq(3L -> 50L, 129L -> 70L)) // 2 was seen
    // re-ingesting the same batch finds nothing: the append landed
    val again = Cdc.ingestNovel(spark, path, frame(2L -> 200L, 3L -> 50L, 129L -> 70L))
    assert(again.count() === 0)
    // the store remains a set: all five distinct hashes, no duplicates
    val store = spark.read.parquet(path)
    assert(store.select("hash").distinct().count() === 5)
    assert(store.count() === 5)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
  }

  test("expression path: codegen column agrees with the kernel; null-safe") {
    import spark.implicits._
    val data = bytes(20000, 10L)
    val df = Seq((1L, data), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "blob")
    val rows = df.select(col("id"),
        graft.plans.CdcExpressions.cdcChunks(col("blob"), 256, 1024, 4096).as("c"))
      .orderBy("id").collect()
    val got = rows(0).getSeq[org.apache.spark.sql.Row](1)
    val cuts = Cdc.boundaries(data, 256, 1024, 4096)
    assert(got.length === cuts.length)
    var start = 0
    cuts.zipWithIndex.foreach { case (c, k) =>
      assert(got(k).getLong(0) === start.toLong)
      assert(got(k).getLong(1) === (c - start).toLong)
      assert(got(k).getLong(2) === Cdc.fnv1a64(data, start, c - start))
      start = c
    }
    assert(rows(1).isNullAt(1))
  }
}
