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

  test("rank-then-encipher: integer masking is a permutation of the declared domain") {
    val key = Fpe.deriveKey(pp)
    // a full small domain: [500, 1499], size 1000
    val masked = (500L to 1499L).map(v => Fpe.maskLong(500L, 1499L, "salary", v, key))
    assert(masked.forall(m => m != null && m >= 500L && m <= 1499L),
      "every masked value stays inside the domain")
    assert(masked.map(_.longValue).distinct.size === 1000, "injective over the full domain")
    // exact inverse
    (500L to 1499L).foreach { v =>
      val m = Fpe.maskLong(500L, 1499L, "salary", v, key)
      assert(Fpe.maskLong(500L, 1499L, "salary", m, key, forward = false) === v)
    }
    // deterministic; tweak-separated
    assert(Fpe.maskLong(0L, 9999L, "a", 123L, key) === Fpe.maskLong(0L, 9999L, "a", 123L, key))
    assert(Fpe.maskLong(0L, 9999L, "a", 123L, key) !== Fpe.maskLong(0L, 9999L, "b", 123L, key))
  }

  test("v2 cycle walk: radix-2 acceptance >= 1/2 — expected < 2 FF1 calls per cell") {
    val key = Fpe.deriveKey(pp)
    // structural law: the walked space 2^w is < 2x every legal domain,
    // so acceptance > 1/2 by construction (this is WHY v2 exists: the
    // r17 radix-10 walk paid ~9.1 calls on the benched domain below)
    for (domain <- Seq(100L, 128L, 129L, 1000L, 1099999L, 1000000000000000000L)) {
      val w = math.max(7, 64 - java.lang.Long.numberOfLeadingZeros(domain - 1))
      assert((BigInt(1) << w) < BigInt(2) * domain && (BigInt(1) << w) >= domain,
        s"domain $domain walks 2^$w")
    }
    // empirical law on the benched mask_fpe_number domain [-99999, 999999]
    // (domain 1,099,999 -> w=21, acceptance 0.5245, expected ~1.9 calls):
    // the mean walk over 400 cells sits far below the radix-10 ~9.1
    val domain = 1099999L
    val walks = (0 until 400).map { i =>
      Fpe.rankEncipherWalk(i.toLong * 2749L % domain, domain, "t", key,
        forward = true)._2
    }
    val mean = walks.sum.toDouble / walks.length
    assert(mean < 2.6, s"mean walk $mean exceeds the radix-2 bound regime")
    assert(walks.max < 40, "geometric tail under p>=1/2") // P(>=40) ~ 2^-40
  }

  test("rank-then-encipher fails closed: null, out-of-domain, tiny or huge domains") {
    val key = Fpe.deriveKey(pp)
    assert(Fpe.maskLong(0L, 999L, "t", null, key) === null)
    assert(Fpe.maskLong(0L, 999L, "t", 1000L, key) === null, "outside the domain")
    assert(Fpe.maskLong(0L, 999L, "t", -1L, key) === null)
    assert(Fpe.maskLong(0L, 98L, "t", 5L, key) === null, "domain < 100 is below FF1's floor")
    assert(Fpe.maskLong(10L, 5L, "t", 7L, key) === null, "inverted bounds")
    assert(Fpe.maskLong(Long.MinValue, Long.MaxValue, "t", 7L, key) === null,
      "overflowing domain fails closed, never wraps")
  }

  test("date masking ranks on epoch days and round-trips") {
    val key = Fpe.deriveKey(pp)
    val lo = java.time.LocalDate.of(1990, 1, 1)
    val hi = java.time.LocalDate.of(2026, 12, 31)
    val d = java.time.LocalDate.of(2001, 9, 9)
    val m = Fpe.maskDate(lo, hi, "dob", d, key)
    assert(m != null && !m.isBefore(lo) && !m.isAfter(hi))
    assert(m !== d)
    assert(Fpe.maskDate(lo, hi, "dob", m, key, forward = false) === d)
    assert(Fpe.maskDate(lo, hi, "dob", null, key) === null)
    // a date outside the declared domain fails closed
    assert(Fpe.maskDate(lo, hi, "dob", java.time.LocalDate.of(1970, 1, 1), key) === null)
  }

  test("SQL surface: mask_fpe_number / mask_fpe_date registered and invertible") {
    graft.Defaults.registerAll(spark)
    import spark.implicits._
    val out = (1L to 200L).toDF("v")
      .selectExpr("v",
        "mask_fpe_number(1, 200, 'acct', v) AS m",
        "unmask_fpe_number(1, 200, 'acct', mask_fpe_number(1, 200, 'acct', v)) AS rt",
        "mask_fpe_date(DATE'2000-01-01', DATE'2026-12-31', 'd', DATE'2013-05-07') AS md")
      .collect()
    assert(out.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 200L))
    assert(out.map(_.getLong(1)).distinct.length === 200)
    assert(out.forall(r => r.getLong(2) == r.getLong(0)))
    val md = out.head.getDate(3).toLocalDate
    assert(!md.isBefore(java.time.LocalDate.of(2000, 1, 1)) &&
      !md.isAfter(java.time.LocalDate.of(2026, 12, 31)))
  }
}
