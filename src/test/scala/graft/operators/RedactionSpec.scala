package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RedactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def redacted(text: String): (String, Long) = {
    import spark.implicits._
    val r = Seq((1L, text)).toDF("doc_id", "text")
      .select(Redaction.redact(col("text")).as("t"),
        Redaction.redactionCount(col("text")).as("n"))
      .collect()(0)
    (r.getString(0), r.getLong(1))
  }

  test("each rule redacts its canonical example") {
    assert(redacted("mail me at jo.doe+x@corp.example.com today") ===
      ("mail me at [EMAIL] today", 1L))
    assert(redacted("card 4111-1111-1111-1111 on file") === ("card [CCN] on file", 1L))
    assert(redacted("ssn is 987-65-4321.") === ("ssn is [SSN].", 1L))
    assert(redacted("call (415) 555-0142 now") === ("call [PHONE] now", 1L))
    assert(redacted("from host 10.0.12.34:8080") === ("from host [IP]:8080", 1L))
  }

  test("an email's digits are not double-counted by the number rules") {
    val (t, n) = redacted("a1234-5678-9012-3456b@x.io")
    assert(t === "[EMAIL]")
    assert(n === 1L)
  }

  test("a credit card is one CCN, not an SSN fragment") {
    val (t, n) = redacted("pay 1234 5678 9012 3456 ok")
    assert(t === "pay [CCN] ok")
    assert(n === 1L)
  }

  test("clean text is untouched and idempotence holds") {
    val (t, n) = redacted("nothing sensitive here, just words and 7 digits")
    assert(t === "nothing sensitive here, just words and 7 digits")
    assert(n === 0L)
    val (t2, n2) = redacted("already [EMAIL] and [SSN] placeholders")
    assert(t2 === "already [EMAIL] and [SSN] placeholders")
    assert(n2 === 0L)
  }

  test("multiple hits across rules all count") {
    val (t, n) = redacted("a@b.co and c@d.org, ssn 111-22-3333, ip 1.2.3.4")
    assert(t === "[EMAIL] and [EMAIL], ssn [SSN], ip [IP]")
    assert(n === 4L)
  }

  test("nulls flow through as nulls") {
    import spark.implicits._
    val r = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(Redaction.redact(col("text"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("adjacent PII leaves zero matchable residue and redact is idempotent") {
    import spark.implicits._
    // adversarial adjacency: tokens joined with separators that could fuse
    // into new matches or leave matchable fragments after one pass
    val toks = Seq("x@y.co", "4111-1111-1111-1111", "987-65-4321",
      "(415) 555-0142", "10.0.12.34")
    val seps = Seq("", "-", ".", "@", "1", ".5", "-11")
    val texts = (for {
      a <- toks; b <- toks; sep <- seps
    } yield s"$a$sep$b") ++ Seq(
      "x@y.co@z.co",               // the ADVICE case: -> [EMAIL]@z.co
      "a@b.co@c.co@d.co@e.co",     // longer mailto chain
      "1.2.3.4.5.6.7.8",           // fused IPs
      "123-45-6789-1234-5678-9012-3456") // SSN/CCN digit run
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = df.select(
      Redaction.redact(col("text")).as("once"),
      Redaction.redact(Redaction.redact(col("text"))).as("twice"),
      Redaction.redactionCount(Redaction.redact(col("text"))).as("residue"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1), "redact must be idempotent")
      assert(r.getLong(2) === 0L, s"matchable residue in '${r.getString(0)}'")
    }
  }

  test("redactExtended: the same adversarial corpus comes out fragment-FREE") {
    import spark.implicits._
    val toks = Seq("x@y.co", "4111-1111-1111-1111", "987-65-4321",
      "(415) 555-0142", "10.0.12.34")
    val seps = Seq("", "-", ".", "@", "1", ".5", "-11")
    val texts = (for {
      a <- toks; b <- toks; sep <- seps
    } yield s"$a$sep$b") ++ Seq(
      "x@y.co@z.co", "a@b.co@c.co@d.co@e.co", "bob@x@y.co",
      "x@y.co@z.co@w", // trailing tld-less fragment: the chain match must eat it
      "1.2.3.4.5.6.7.8", "123-45-6789-1234-5678-9012-3456")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = df.select(
      col("text"),
      Redaction.redactExtended(col("text")).as("once"),
      Redaction.redactExtended(Redaction.redactExtended(col("text"))).as("twice"))
      .collect()
    rows.foreach { r =>
      val out = r.getString(1)
      assert(out === r.getString(2), s"redactExtended must be idempotent on '${r.getString(0)}'")
      // fragment-free: no @-adjacency with a placeholder survives in either direction
      assert(!out.matches(".*\\[EMAIL\\]@[A-Za-z0-9.-].*"), s"domain fragment in '$out' from '${r.getString(0)}'")
      assert(!out.matches(".*[A-Za-z0-9._%+-]@\\[EMAIL\\].*"), s"local fragment in '$out' from '${r.getString(0)}'")
    }
    // the ADVICE counter-example specifically
    val adviceCase = spark.sql("SELECT 1").select(
      Redaction.redactExtended(org.apache.spark.sql.functions.lit("x@y.co@z.co"))).collect()(0).getString(0)
    assert(adviceCase === "[EMAIL]")
    // default mode is untouched: the documented fragment still appears there
    val defaultCase = spark.sql("SELECT 1").select(
      Redaction.redact(org.apache.spark.sql.functions.lit("x@y.co@z.co"))).collect()(0).getString(0)
    assert(defaultCase === "[EMAIL]@z.co")
  }

  test("placeholders are outside every rule's alphabet (idempotence precondition)") {
    // If a future rule edit lets any pattern match a placeholder (or span
    // one), the single-pass zero-residue argument breaks. Pin it.
    for ((_, _, placeholder) <- Redaction.rules; (name, pat, _) <- Redaction.rules)
      assert(!pat.r.findFirstIn(placeholder).isDefined,
        s"rule '$name' matches placeholder '$placeholder'")
  }
}
