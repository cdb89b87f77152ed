package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The reference's first-run scenario end-to-end (mirrors
  * MaskDataTransformSuite.scala:59-114): messy delimited extract with
  * renamed headers -> schema-driven typing (dd/MM/uuuu dates, verbose
  * AEST/AEDT day-name timestamps, null markers, trim) -> metadata-driven
  * masking incl. the two-treatment create_date composition -> published
  * output view. */
class FixtureE2ESpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def typedFixture() = {
    val path = FixtureData.writeUserdataCsv(100)
    TypedSource.readCsvPositional(spark, path, FixtureData.userdataSpecs)
  }

  test("typing: schema, header renaming, null markers, formatter fallback") {
    val typed = typedFixture()
    assert(typed.columns.toSeq === Seq("username", "city", "last_name", "birth_date", "zip_code",
      "create_date", "first_name", "state", "user_id", "country", "email", "street"))
    val types = typed.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("birth_date") === DateType)
    assert(types("create_date") === TimestampType)
    assert(types("user_id") === IntegerType)
    assert(types("username") === StringType)

    val rows = typed.orderBy("user_id").collect()
    assert(rows.length === 100)
    // "null" marker -> null (5 rows by construction), padding trimmed
    assert(rows.count(_.isNullAt(0)) === 5)
    assert(rows(7).getString(0) === "user_7") // was "  user_7 "
    // unparseable dd/MM date -> null, not an ANSI exception (4 rows)
    assert(rows.count(_.isNullAt(3)) === 4)
    assert(rows(3).isNullAt(3))
    // both verbose formatter variants parse: every create_date is typed
    assert(rows.count(_.isNullAt(5)) === 0)
    // unicode survives CSV read + typing byte-exact; leading zeros survive
    // because zip_code types as STRING
    assert(rows(5).getString(9) === "São Fictícia")
    assert(rows(4).getString(4) === "00004")
  }

  test("typing: AEST (+10) and AEDT (+11) offsets produce the exact UTC instants") {
    val typed = typedFixture()
    val rows = typed.orderBy("user_id").collect()
    for (i <- Seq(0, 1, 2, 49)) { // both offset parities
      val got = rows(i).getAs[java.sql.Timestamp](5).toInstant
      assert(got === FixtureData.expectedCreateUtc(i), s"row $i")
    }
  }

  test("specsFromJson: the reference schema-file format drives the same pipeline") {
    // our fixture schema expressed in the reference's JSON shape (name/type/
    // trim/nullableValues/formatters/timezoneId/metadata.mask.treatments)
    def f(name: String, typ: String, extra: String = ""): String =
      s"""{"name": "$name", "type": "$typ", "trim": true, "nullable": true,
         |"nullableValues": ["", "null"]$extra}""".stripMargin
    val maskStr = ""","metadata": {"pii": true, "mask": {"treatments": ["mask_string(16, true, ${value})"]}}"""
    val birthExtra = ""","formatters": ["dd/MM/uuuu"],"metadata": {"mask": {"treatments": ["date_trunc('MONTH', ${value})"]}}"""
    val createExtra =
      ""","formatters": ["EEE MMM dd uuuu HH:mm:ss 'GMT'ZZZ '(Australian Eastern Daylight Time)'",
        |"EEE MMM dd uuuu HH:mm:ss 'GMT'ZZZ '(Australian Eastern Standard Time)'"],
        |"timezoneId": "UTC",
        |"metadata": {"mask": {"treatments": ["date_trunc('HOUR', ${value})", "mask_timestamp(14, true, ${value})"]}}""".stripMargin
    val json = Seq(
      f("username", "string", maskStr), f("city", "string"), f("last_name", "string"),
      f("birth_date", "date", birthExtra), f("zip_code", "string"),
      f("create_date", "timestamp", createExtra), f("first_name", "string"),
      f("state", "string"), f("user_id", "integer"), f("country", "string"),
      f("email", "string"), f("street", "string")).mkString("[", ",", "]")

    val specs = TypedSource.specsFromJson(json)
      .fold(errs => fail(errs.mkString("; ")), identity)
    assert(specs.map(_.name) === FixtureData.userdataSpecs.map(_.name))
    assert(specs.map(_.dataType) === FixtureData.userdataSpecs.map(_.dataType))
    assert(specs.map(_.formatters) === FixtureData.userdataSpecs.map(_.formatters))
    assert(specs(0).metadata.getMetadata("mask").getStringArray("treatments").toSeq ===
      Seq("mask_string(16, true, ${value})"))

    // the parsed specs type + mask the fixture identically to the hand-built ones
    graft.functions.MaskUdfs.register(spark, SparkTestBase.fastCodec, SparkTestBase.passphrase)
    val path = FixtureData.writeUserdataCsv(100)
    val viaJson = graft.operators.MaskTransform(
      TypedSource.readCsvPositional(spark, path, specs)).orderBy("user_id").collect()
    val viaHand = graft.operators.MaskTransform(
      TypedSource.readCsvPositional(spark, path, FixtureData.userdataSpecs)).orderBy("user_id").collect()
    assert(viaJson.map(_.toString).toSeq === viaHand.map(_.toString).toSeq)

    // error accumulation
    val Left(errs) = TypedSource.specsFromJson("""[{"type": "string"}, 42]"""): @unchecked
    assert(errs.size === 2)
    assert(TypedSource.specsFromJson("""{"not": "an array"}""").isLeft)
    // decimal precision/scale mapping
    val Right(dec) = TypedSource.specsFromJson(
      """[{"name": "amount", "type": "decimal", "precision": 12, "scale": 2}]"""): @unchecked
    assert(dec.head.dataType === "decimal(12,2)")
  }

  test("mask stage: config -> projection -> published view, reference treatments applied") {
    graft.functions.MaskUdfs.register(spark, SparkTestBase.fastCodec, SparkTestBase.passphrase)
    typedFixture().createOrReplaceTempView("fixture_typed")
    val cfg =
      """{"type": "MaskDataTransform", "name": "mask userdata", "environments": ["test"],
        |"inputView": "fixture_typed", "outputView": "fixture_masked", "persist": true}""".stripMargin
    val result = graft.operators.StageConfig.run(spark, cfg)
    assert(result.isRight, result.left.getOrElse(Nil).mkString("; "))

    val masked = spark.table("fixture_masked")
    // schema unchanged: types re-asserted after every treatment chain
    assert(masked.schema("birth_date").dataType === DateType)
    assert(masked.schema("create_date").dataType === TimestampType)
    // mask metadata survives the projection (re-attach contract)
    assert(masked.schema("username").metadata.contains("mask"))

    val typedRows = typedFixture().orderBy("user_id").collect()
    val rows = masked.orderBy("user_id").collect()

    // username: 16 alpha chars, null-through for the 5 null rows
    assert(rows.count(_.isNullAt(0)) === 5)
    assert(rows.filterNot(_.isNullAt(0)).forall(_.getString(0).matches("[A-Za-z]{16}")))
    // deterministic: same inputs mask identically across the two projections
    val again = graft.operators.MaskTransform(typedFixture()).orderBy("user_id").collect()
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ===
      again.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq)
    // but not equal to the input (actually masked)
    assert(rows.filterNot(_.isNullAt(0)).forall(r => !r.getString(0).startsWith("user_")))

    // birth_date: truncated to month start, null-through for the 4 bad rows
    assert(rows.count(_.isNullAt(3)) === 4)
    assert(rows.filterNot(_.isNullAt(3)).forall(_.getAs[java.sql.Date](3).toLocalDate.getDayOfMonth === 1))

    // create_date composition: hour-truncated THEN day-jittered within 14
    // days with time-of-day preserved (zero minutes/seconds survive jitter)
    val dayMs = 24L * 3600 * 1000
    rows.zip(typedRows).foreach { case (m, t) =>
      val masked = m.getAs[java.sql.Timestamp](5).toInstant
      val utc = java.time.ZoneOffset.UTC
      assert(masked.atZone(utc).getMinute === 0 && masked.atZone(utc).getSecond === 0)
      val truncOrig = t.getAs[java.sql.Timestamp](5).toInstant
        .atZone(utc).withMinute(0).withSecond(0).withNano(0).toInstant
      assert(math.abs(masked.toEpochMilli - truncOrig.toEpochMilli) < 14 * dayMs)
    }
  }
}
