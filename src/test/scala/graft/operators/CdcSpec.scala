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
