package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class FpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val pp = graft.Defaults.testPassphrase
  private val digitsA = "0123456789"

  test("separators pass through in place; digits cycle over the alphabet") {
    val m = Fpe.mask(pp)("0123456789", "cc", "4111-1111-1111-1111")
    assert(m.matches("^[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}$"))
    assert(m !== "4111-1111-1111-1111")
    assert(Fpe.unmask(pp)(digitsA, "cc", m) === "4111-1111-1111-1111")
  }

  test("deterministic per (passphrase, tweak); tweak separates columns") {
    assert(Fpe.mask(pp)(digitsA, "cc", "1234567890") ===
      Fpe.mask(pp)(digitsA, "cc", "1234567890"))
    assert(Fpe.mask(pp)(digitsA, "cc", "1234567890") !==
      Fpe.mask(pp)(digitsA, "ssn", "1234567890"))
    assert(Fpe.mask("other-passphrase-0123456789-0123456789-0123456789-0123456789ab".getBytes)(
      digitsA, "cc", "1234567890") !== Fpe.mask(pp)(digitsA, "cc", "1234567890"))
  }

  test("null passes; below-domain values fail CLOSED to null, never echo") {
    assert(Fpe.mask(pp)(digitsA, "cc", null) === null)
    assert(Fpe.mask(pp)(digitsA, "cc", "7") === null) // 1 digit < minlen 2
    assert(Fpe.mask(pp)(digitsA, "cc", "no digits here") === null)
    assert(Fpe.mask(pp)("01", "bits", "0110") === null) // 2^4 = 16 < 100
    // 2 digits over radix 10 = domain 100: exactly at the spec minimum
    assert(Fpe.mask(pp)(digitsA, "cc", "42") !== null)
  }

  test("SQL surface: mask_fpe/unmask_fpe registered, invertible, injective") {
    import spark.implicits._
    graft.Defaults.registerAll(spark)
    val out = (1L to 500L).map(i => f"4$i%015d").toDF("pan")
      .selectExpr("pan",
        "mask_fpe('0123456789', 'pan', pan) AS m")
      .selectExpr("pan", "m", "unmask_fpe('0123456789', 'pan', m) AS um")
    val rows = out.collect()
    assert(rows.forall(r => r.getString(1).matches("^[0-9]{16}$")))
    assert(rows.forall(r => r.getString(2) === r.getString(0)))
    assert(rows.map(_.getString(1)).distinct.length === 500) // injective
    assert(out.where(col("m") === col("pan")).count() === 0L)
  }

  test("alphabet with duplicate characters is rejected") {
    intercept[IllegalArgumentException](Fpe.mask(pp)("0120456789", "t", "123"))
  }
}
