package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class StageConfigSpec extends AnyFunSuite {

  test("valid config parses to a typed stage with defaults") {
    val Right(stage) = StageConfig.parseJson(
      """{"type":"MaskDataTransform","name":"mask","environments":["test"],
        |"inputView":"in_v","outputView":"out_v"}""".stripMargin): @unchecked
    assert(stage.name === "mask")
    assert(stage.inputView === "in_v" && stage.outputView === "out_v")
    assert(!stage.persist && stage.params.isEmpty && stage.description.isEmpty)
  }

  test("errors accumulate: unknown keys + every missing field reported at once") {
    val Left(errors) = StageConfig.parseJson(
      """{"typo":"x","another":"y","persist":"maybe"}"""): @unchecked
    assert(errors.exists(_.contains("Unknown option 'typo'")))
    assert(errors.exists(_.contains("Unknown option 'another'")))
    assert(errors.exists(_.contains("Missing required attribute 'name'")))
    assert(errors.exists(_.contains("Missing required attribute 'inputView'")))
    assert(errors.exists(_.contains("Missing required attribute 'outputView'")))
    assert(errors.exists(_.contains("'persist' must be a boolean")))
    assert(errors.size >= 6)
  }

  test("non-object json is rejected") {
    assert(StageConfig.parseJson("[1,2,3]").isLeft)
    assert(StageConfig.parseJson("not json").isLeft)
  }

  test("environments gate: stage skipped when active env not listed, run when it is") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    graft.functions.MaskUdfs.register(spark, SparkTestBase.fastCodec, SparkTestBase.passphrase)
    val meta = new MetadataBuilder().putMetadata("mask",
      new MetadataBuilder().putStringArray("treatments", Array("mask_string(16, true, ${value})")).build()).build()
    val schema = StructType(Seq(StructField("secret", StringType, nullable = true, meta)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row("sensitive"))), schema)
      .createOrReplaceTempView("env_in")
    val cfg =
      """{"name":"mask","environments":["production"],"inputView":"env_in","outputView":"env_out"}"""
    // active env not in the list -> validated but skipped
    assert(StageConfig.runIfEnvironment(spark, cfg, "test") === Right(None))
    assert(!spark.catalog.tableExists("env_out"), "skipped stage must not publish")
    // matching env -> runs
    val Right(Some(df)) = StageConfig.runIfEnvironment(spark, cfg, "production"): @unchecked
    assert(df.collect()(0).getString(0).length === 16)
    // empty/absent list -> runs everywhere
    val cfg2 = """{"name":"mask","inputView":"env_in","outputView":"env_out2"}"""
    assert(StageConfig.runIfEnvironment(spark, cfg2, "anything").toOption.get.isDefined)
    // malformed environments accumulates an error
    val Left(errs) = StageConfig.parseJson(
      """{"name":"m","environments":"prod","inputView":"a","outputView":"b"}"""): @unchecked
    assert(errs.exists(_.contains("'environments' must be an array of strings")))
    spark.catalog.dropTempView("env_out")
    spark.catalog.dropTempView("env_out2")
  }

  test("run executes the configured stage end to end") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    graft.functions.MaskUdfs.register(spark, SparkTestBase.fastCodec, SparkTestBase.passphrase)
    val meta = new MetadataBuilder().putMetadata("mask",
      new MetadataBuilder().putStringArray("treatments", Array("mask_string(16, true, ${value})")).build()).build()
    val schema = StructType(Seq(StructField("secret", StringType, nullable = true, meta)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row("sensitive"))), schema)
      .createOrReplaceTempView("sc_in")
    val Right(df) = StageConfig.run(spark,
      """{"name":"mask","inputView":"sc_in","outputView":"sc_out","persist":true}"""): @unchecked
    assert(df.collect()(0).getString(0).length === 16)
    assert(spark.table("sc_out").count() === 1)
    spark.catalog.dropTempView("sc_out")
  }
}
