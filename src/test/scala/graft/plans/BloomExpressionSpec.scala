package graft.plans

import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomExpressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("probe finds all inserted keys and rejects most others") {
    import spark.implicits._
    val bloom = BloomFilter.create(1000, 0.01)
    (0 until 500).foreach(i => bloom.putString(s"key-$i"))
    val df = (0 until 1000).map(i => s"key-$i").toDF("s")
    val hits = df.where(BloomExpression.mightContain(col("s"), bloom)).count()
    // no false negatives: all 500 inserted; false positives bounded well
    // above the configured 1% to keep the test deterministic-safe
    assert(hits >= 500L && hits <= 550L, s"got $hits")
  }

  test("string probe agrees with mightContainString (UTF-8 byte hashing)") {
    import spark.implicits._
    val bloom = BloomFilter.create(100, 0.01)
    val keys = Seq("plain", "uniçødé 中文", "", "with space")
    keys.foreach(bloom.putString)
    val df = (keys ++ Seq("absent1", "absent2")).toDF("s")
    val got = df.select(col("s"), BloomExpression.mightContain(col("s"), bloom).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    keys.foreach(k => assert(got(k), s"inserted key '$k' not found"))
    assert(got.forall { case (k, m) => m == bloom.mightContainString(k) })
  }

  test("structural equality is digest-backed: equal images compare equal, O(1) per call") {
    val mk = () => {
      val b = BloomFilter.create(1000, 0.01)
      (0 until 500).foreach(i => b.putString(s"key-$i"))
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    val (b1, b2) = (mk(), mk())
    assert(!(b1 eq b2))
    val (i1, i2) = (new BloomImage(b1), new BloomImage(b2))
    // same content, different array instances: structurally equal (this is
    // what lets Catalyst dedup identical probes / reuse exchanges)
    assert(i1 === i2)
    assert(i1.hashCode === i2.hashCode)
    // a single flipped byte must break equality
    val mutated = b2.clone()
    mutated(mutated.length / 2) = (mutated(mutated.length / 2) ^ 1).toByte
    assert(i1 !== new BloomImage(mutated))
    // repeated comparisons hit the cached digest, not a byte scan: 100k
    // equals calls on a ~1KB image complete instantly if cached (would be
    // ~100MB of scanning otherwise, still fast - the real guard is the
    // BloomImage implementation reviewed here; this is a smoke bound)
    val t0 = System.nanoTime()
    var n = 0
    (0 until 100000).foreach(_ => if (i1 == i2) n += 1)
    assert(n === 100000)
    assert((System.nanoTime() - t0) / 1e9 < 2.0)
  }

  test("nulls stay null and the probe stays inside codegen (no UDF)") {
    import spark.implicits._
    val bloom = BloomFilter.create(10, 0.01)
    bloom.putString("x")
    val df = Seq(Some("x"), None).toDF("s")
    val rows = df.select(BloomExpression.mightContain(col("s"), bloom)).collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
    // a range source (not a LocalRelation, which folds filters eagerly)
    // shows the probe as a codegen'd filter, not a UDF
    val ranged = spark.range(100).selectExpr("concat('k', id) AS s")
      .where(BloomExpression.mightContain(col("s"), bloom))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_bloom_might_contain") && l.trim.matches("""^[+-]*\s*\*\(\d+\) Filter.*""")), plan)
    ranged.collect() // and the generated code actually compiles and runs
  }
}
