package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SinksSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("writePartitioned bounds files per partition value and round-trips rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    // skewed: lang 'en' has 10x the rows of the others
    val df = (0 until 1200).map { i =>
      val lang = if (i < 1000) "en" else if (i < 1100) "de" else "fr"
      (i.toLong, lang, s"text $i")
    }.toDF("doc_id", "lang", "text")
    Sinks.writePartitioned(df.repartition(8), dir, Seq("lang"), filesPerPartition = 2)

    // bounded fan-out: <= 2 data files per partition dir even for skewed 'en'
    for (lang <- Seq("en", "de", "fr")) {
      val files = new java.io.File(s"$dir/lang=$lang").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length >= 1 && files.length <= 2, s"$lang: ${files.length} files")
    }
    // exact roundtrip
    val back = spark.read.parquet(dir)
    assert(back.count() === 1200)
    assert(back.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === Map("en" -> 1000L, "de" -> 100L, "fr" -> 100L))
    // dynamic overwrite: rewriting only 'fr' leaves the other partitions
    Sinks.writePartitioned(
      Seq((9999L, "fr", "replacement")).toDF("doc_id", "lang", "text"),
      dir, Seq("lang"), filesPerPartition = 1)
    val after = spark.read.parquet(dir)
    assert(after.where($"lang" === "fr").count() === 1, "fr replaced")
    assert(after.where($"lang" === "en").count() === 1000, "en untouched by dynamic overwrite")
  }
}
