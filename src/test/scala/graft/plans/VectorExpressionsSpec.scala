package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("DotProduct matches the higher-order-function computation exactly") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5), Array(2.0, 2.0)),
      (Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, v) => s + v).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows(0).getDouble(0) === 32.0)
    assert(rows(2).getDouble(0) === 0.0)
  }

  test("DotProduct is null-safe and type-checked") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]])).toDF("a", "b")
    val r = df.select(VectorExpressions.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
    val bad = Seq(("x", 1)).toDF("a", "b")
    val e = intercept[Exception](bad.select(VectorExpressions.dot(col("a"), col("b"))).collect())
    assert(e.getMessage.contains("graft_dot_product") || e.getMessage.contains("DATATYPE"))
  }

  test("HyperplaneSignature matches a plain Scala recomputation, null-safe, codegen'd") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val planes = Array.fill(16)(Array.fill(8)(rnd.nextGaussian()))
    val vecs = Seq.fill(50)(Array.fill(8)(rnd.nextGaussian().toFloat))
    def reference(emb: Array[Float]): Long = {
      var sig = 0L
      for (b <- planes.indices) {
        val acc = planes(b).zip(emb).map { case (p, x) => p * x }.sum
        if (acc >= 0) sig |= (1L << b)
      }
      sig
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    val got = df.select(col("id"), VectorExpressions.hyperplaneSig(col("emb"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) => assert(got(i.toLong) === reference(v), s"vec $i") }

    // null-safe
    val withNull = Seq((0L, Some(vecs.head)), (1L, None: Option[Array[Float]])).toDF("id", "emb")
    val r = withNull.select(VectorExpressions.hyperplaneSig(col("emb"), planes)).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))

    // stays inside whole-stage codegen (parquet-backed: a local relation
    // would be constant-folded into a LocalTableScan at plan time)
    val dim = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    val filePlanes = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    val plan = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorExpressions.hyperplaneSig(col("embedding"), filePlanes).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), "native expression must stay inside codegen:\n" + plan)
  }

  test("SimHash64 matches the pre-migration UDF computation, null-safe, codegen'd") {
    import spark.implicits._
    // the exact logic of the Scala UDF this expression replaced — value
    // parity keeps dedup_simhash signatures stable across the migration
    def reference(tokens: Seq[String]): Long = {
      val acc = new Array[Int](64)
      tokens.foreach { t =>
        val h = scala.util.hashing.MurmurHash3.stringHash(t, 0x51_7c_c1_b7).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(t, 0x27_22_0a_95).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (acc(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
    val rnd = new scala.util.Random(7)
    val docs = Seq.fill(40)(Seq.fill(1 + rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(9)).mkString)) :+
      Seq.empty[String]
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
      .select(col("id"), VectorExpressions.simhash64(col("toks")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.zipWithIndex.foreach { case (t, i) => assert(got(i.toLong) === reference(t), s"doc $i") }

    // null-safe: null token array -> null signature (drops out downstream)
    val withNull = Seq((0L, Some(Seq("a", "b"))), (1L, None: Option[Seq[String]])).toDF("id", "toks")
    val r = withNull.select(VectorExpressions.simhash64(col("toks"))).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))

    // stays inside whole-stage codegen on a file-backed plan
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(VectorExpressions.simhash64(split(lower(col("text")), "\\s+")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), "native expression must stay inside codegen:\n" + plan)
  }

  test("DotProduct participates in whole-stage codegen") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("e"))
    val plan = df.select(VectorExpressions.dot(col("e"), col("e")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), "native expression must stay inside codegen:\n" + plan)
  }

  test("dot: length mismatch and null elements yield NULL, never a truncated score") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0))), // ok: 11
      (2L, Seq(Option(1.0)), Seq(Option(3.0), Option(4.0))),              // length mismatch
      (3L, Seq(Option(1.0), Option.empty[Double]), Seq(Option(3.0), Option(4.0))) // null elem
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VectorExpressions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(1L -> Some(11.0), 2L -> None, 3L -> None))
  }

  test("hyperplane/centroid/minhash: corrupt vectors yield NULL, not confident routing") {
    import spark.implicits._
    val planes = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cents = Array(Array(1.0, 0.0))
    val good = Seq(Option(1.0f), Option(2.0f))
    val shortV = Seq(Option(1.0f))
    val nullV = Seq(Option(1.0f), Option.empty[Float])
    val df = Seq((1L, good), (2L, shortV), (3L, nullV)).toDF("id", "e")
    val out = df.select(col("id"),
        VectorExpressions.hyperplaneSig(col("e"), planes).as("h"),
        VectorExpressions.nearestCentroid(col("e"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) === ((false, false)))
    assert(out(2L) === ((true, true)))
    assert(out(3L) === ((true, true)))
    val mh = Seq((1L, Seq(Option(5L), Option(9L))), (2L, Seq(Option(5L), Option.empty[Long])))
      .toDF("id", "hs")
      .select(col("id"), VectorExpressions.minhashSignature(col("hs"), Array(3L), Array(7L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(mh === Map(1L -> false, 2L -> true))
  }
}
