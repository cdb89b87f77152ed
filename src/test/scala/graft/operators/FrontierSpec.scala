package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FrontierSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def freshDir(name: String): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"${name}_${System.nanoTime()}")
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    f.getAbsolutePath
  }

  test("novelUrls == batch canon set minus store canon set (exact, bloom invisible)") {
    import spark.implicits._
    val path = freshDir("graft_frontier_spec")
    val seen = (1 to 300).map(i => s"https://www.f${i % 9}.com/p/$i")
    Frontier.writeSeenStore(seen.toDF("url"), "url", path, capacity = 10000)
    // batch: messy spellings of 150 seen urls + 100 genuinely new ones
    val batch = (1 to 150).map(i => s"HTTPS://WWW.F${i % 9}.COM:443/p/$i?utm_source=x#frag") ++
      (1000 to 1099).map(i => s"https://www.f${i % 9}.com/p/$i")
    val novel = Frontier.novelUrls(spark, path, batch.toDF("url"), "url")
      .collect().map(_.getString(0)).toSet
    assert(novel === (1000 to 1099).map(i => s"https://www.f${i % 9}.com/p/$i").toSet,
      "canonicalization must unify the messy spellings with the stored clean ones")
  }

  test("markSeen: previously-novel urls stop being novel; re-adding seen is harmless") {
    import spark.implicits._
    val path = freshDir("graft_frontier_mark")
    Frontier.writeSeenStore((1 to 50).map(i => s"https://m.io/$i").toDF("url"), "url",
      path, capacity = 10000)
    val batch = (40 to 80).map(i => s"https://m.io/$i").toDF("url")
    val firstNovel = Frontier.novelUrls(spark, path, batch, "url")
    assert(firstNovel.count() === 30)
    Frontier.markSeen(path, firstNovel, "canon", capacity = 10000)
    assert(Frontier.novelUrls(spark, path, batch, "url").count() === 0)
    // idempotent: re-marking the same urls must not resurrect novelty
    Frontier.markSeen(path, batch, "url", capacity = 10000)
    assert(Frontier.novelUrls(spark, path, batch, "url").count() === 0)
  }

  test("hostless/garbage urls drop; empty store says everything is novel") {
    import spark.implicits._
    val path = freshDir("graft_frontier_empty")
    Frontier.writeSeenStore(Seq.empty[String].toDF("url"), "url", path, capacity = 100)
    val batch = Seq("https://a.io/x", "not a url", "https://b.io/y").toDF("url")
    val novel = Frontier.novelUrls(spark, path, batch, "url")
      .collect().map(_.getString(0)).toSet
    assert(novel === Set("https://a.io/x", "https://b.io/y"))
  }

  test("tiny capacity degrades the bloom, never the answer (confirm join is exact)") {
    import spark.implicits._
    val path = freshDir("graft_frontier_tiny")
    // capacity 2 for 200 urls: the bloom saturates and flags ~everything
    // as maybe-seen; the exact confirm must still find the true novels
    Frontier.writeSeenStore((1 to 200).map(i => s"https://t.io/$i").toDF("url"), "url",
      path, capacity = 2)
    val batch = ((150 to 260).map(i => s"https://t.io/$i")).toDF("url")
    val novel = Frontier.novelUrls(spark, path, batch, "url")
      .collect().map(_.getString(0)).toSet
    assert(novel === (201 to 260).map(i => s"https://t.io/$i").toSet)
  }
}
