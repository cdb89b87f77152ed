package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("salted join equals plain join on skewed data (inner and left)") {
    import spark.implicits._
    // heavily skewed: 90% of big rows share key 1
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"tail$i")))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (999L, "unmatched")).toDF("k", "dim")

    val plain = big.join(small, "k").select("k", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedJoin(big, small, "k", salts = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq === plain.toSeq)

    val plainLeft = big.join(small, Seq("k"), "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).sorted
    val saltedLeft = SkewJoin.saltedJoin(big, small, "k", salts = 8, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).sorted
    assert(saltedLeft.toSeq === plainLeft.toSeq)
  }

  test("map-typed columns are excluded from the salt basis; saltCols overrides") {
    import spark.implicits._
    // xxhash64 over a MapType column is an AnalysisException since Spark 3 -
    // the salt basis must skip it automatically
    val big = Seq((1L, Map("a" -> 1), "x1"), (1L, Map("b" -> 2), "x2"), (2L, Map("c" -> 3), "y"))
      .toDF("k", "attrs", "payload")
    val small = Seq((1L, "hot"), (2L, "warm")).toDF("k", "dim")
    val plain = big.join(small, "k").select("k", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val auto = SkewJoin.saltedJoin(big, small, "k", salts = 4)
      .select("k", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(auto.toSeq === plain.toSeq)
    // explicit surrogate column (the duplicate-row escape hatch)
    val explicit = SkewJoin.saltedJoin(big, small, "k", salts = 4, saltCols = Seq("payload"))
      .select("k", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(explicit.toSeq === plain.toSeq)
  }

  test("hot key spreads across salt sub-keys with the real content-derived salt") {
    import spark.implicits._
    // hot key 1 with DISTINCT payloads — the case the content salt handles
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val spread = big.withColumn("__graft_salt", SkewJoin.saltColumn(big, 8))
      .groupBy("__graft_salt").count().collect()
    assert(spread.length === 8, "all 8 salt values used")
    assert(spread.map(_.getLong(1)).max < 1000 * 0.3, "no salt holds a dominant share")
    // documented degeneration: byte-identical duplicate rows share ONE salt
    val dups = Seq.fill(100)((1L, 7)).toDF("k", "v")
    val dupSpread = dups.withColumn("__graft_salt", SkewJoin.saltColumn(dups, 8))
      .groupBy("__graft_salt").count().collect()
    assert(dupSpread.length === 1)
    // ...and the saltCols surrogate escape hatch restores the spread
    val withId = dups.withColumn("row_id", org.apache.spark.sql.functions.monotonically_increasing_id())
    val fixed = withId.withColumn("__graft_salt", SkewJoin.saltColumn(withId, 8, Seq("row_id")))
      .groupBy("__graft_salt").count().collect()
    assert(fixed.length > 1, "surrogate id must spread duplicate rows")
  }
}
