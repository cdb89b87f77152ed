package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class VocabSpec extends AnyFunSuite {

  private val codec = SparkTestBase.fastCodec
  private val pp = SparkTestBase.passphrase

  test("vocab lists are non-trivial and stable") {
    for (cat <- Seq("first_name_male", "first_name_female", "last_name")) {
      val l = Vocab.list("en-AU", cat)
      assert(l.size > 1000, s"$cat too small: ${l.size}")
      assert(l.distinct.size === l.size, s"$cat has duplicates")
    }
    assert(Vocab.list("en-AU", "free_email").size === 3)
    // regenerating produces the identical list (determinism across JVMs)
    assert(Vocab.list("en-AU", "last_name") === Vocab.list("en-AU", "last_name"))
  }

  test("pick is deterministic, in-vocabulary, null-preserving") {
    val p = Vocab.pick(codec, pp) _
    assert(p("en-AU", "first_name_male", true, null) === null)
    val v1 = p("en-AU", "first_name_male", true, "john smith")
    assert(v1 === p("en-AU", "first_name_male", true, "john smith"))
    assert(Vocab.list("en-AU", "first_name_male").contains(v1))
    assert(intercept[Exception](p("xx-XX", "last_name", true, "v")).getMessage.contains("unknown vocabulary locale"))
    assert(intercept[Exception](p("en-AU", "nope", true, "v")).getMessage.contains("unknown vocabulary category"))
  }

  test("mask_email: deterministic pseudonymous local part + free domain") {
    val e = Vocab.maskEmail(codec, pp)(true, "alice@corporate.example")
    assert(e === Vocab.maskEmail(codec, pp)(true, "alice@corporate.example"))
    assert(e.matches("[a-z]{12}@(gmail|yahoo|hotmail)\\.com"), e)
    assert(Vocab.maskEmail(codec, pp)(true, null) === null)
  }

  test("mask_name / mask_email over SQL") {
    val spark = SparkTestBase.spark
    Vocab.register(spark, codec, pp)
    val row = spark.sql(
      """SELECT mask_name('last_name', true, 'Smith') AS ln,
        |       mask_email(true, 'bob@example.com') AS em,
        |       mask_name('last_name', true, null) AS lnn""".stripMargin).collect()(0)
    assert(Vocab.list("en-AU", "last_name").contains(row.getString(0)))
    assert(row.getString(1).contains("@"))
    assert(row.isNullAt(2))
  }
}
