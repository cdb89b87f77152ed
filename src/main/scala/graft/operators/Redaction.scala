package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction over free text — the unstructured-text counterpart of the
  * reference's column-level masking (`MaskDataTransform`,
  * /root/reference/src/main/scala/ai/tripl/arc/transform/MaskDataTransform.scala:107-173
  * masks whole columns; it has no surface for PII *inside* a text column,
  * which is the dominant leak path in LLM training corpora).
  *
  * Everything is composed `regexp_replace` / `regexp_count` over builtin
  * codegen'd expressions: a narrow projection with no UDFs, no shuffle, and
  * no state — the operator scales linearly with corpus bytes and keeps
  * whole-stage codegen intact, which is the property that matters at 100 TB.
  *
  * The patterns are deliberately in the common subset of Java regex and
  * RE2 (no backreferences, no lookaround) so any engine — the DuckDB
  * oracle, a warehouse audit job — can recompute match counts bit-for-bit.
  */
object Redaction {

  /** (name, pattern, placeholder) — applied in this order. Order matters
    * only where patterns could overlap (credit cards are redacted before
    * SSNs so a 16-digit group is never half-eaten by the SSN rule).
    *
    * Why a single pass suffices (i.e. why [[redact]] is idempotent and the
    * oracle's zero-residue pin is by construction, not fixture luck):
    * every placeholder is a bracketed letter-only token, and `[` / `]`
    * appear in no rule's character classes, while every pattern requires
    * digits or an `@` flanked by class characters. So no rule can match
    * into, across, or out of a placeholder, and a match lying entirely
    * within surviving original text is found by the same left-to-right
    * scan that produced the replacement (Java's replaceAll finds all
    * non-overlapping matches). A second pass is therefore a provable
    * no-op — and at corpus scale it would double the regex CPU of the
    * hottest projection for nothing. `RedactionSpec` pins this with
    * adjacent-token adversarial cases (e.g. `x@y.co@z.co`).
    *
    * Known limitation, by the same argument: adjacent PII can leave a
    * *non-matchable fragment* — `x@y.co@z.co` redacts to `[EMAIL]@z.co`
    * and the trailing `@z.co` survives because a bare domain is not an
    * email under the rule. The fragment contains no complete PII item;
    * callers needing fragment-free output use [[redactExtended]] (the
    * opt-in fragment rule set) rather than re-running the pipeline.
    * Anyone editing [[rules]] must keep placeholders outside every
    * pattern's alphabet or the idempotence argument (and the residue
    * oracle) breaks. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ccn", "\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}", "[CCN]"),
    ("ssn", "\\d{3}-\\d{2}-\\d{4}", "[SSN]"),
    ("phone", "\\(\\d{3}\\) \\d{3}-\\d{4}", "[PHONE]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** Count of matches for one rule (pre-redaction). */
  def count(text: Column, rule: String): Column =
    rules.find(_._1 == rule) match {
      case Some((_, pat, _)) => regexp_count(text, lit(pat)).cast("long")
      case None => throw new IllegalArgumentException(s"unknown redaction rule '$rule'")
    }

  /** The text with every rule applied left-to-right. Composes into one
    * projection; each regexp_replace is a codegen'd builtin. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (_, pat, repl)) => regexp_replace(c, pat, repl) }

  /** Opt-in fragment rules, applied AFTER [[rules]]: collapse the
    * non-matchable email fragments adjacent PII can leave behind
    * (`[EMAIL]@z.co`, `bob@[EMAIL]`) into the placeholder itself.
    *
    * These patterns deliberately match INTO placeholders — the opposite of
    * the default set's idempotence precondition — which is exactly why
    * they are a separate opt-in pass. They keep single-pass idempotence by
    * a different argument: each pattern consumes a MAXIMAL `@`-joined
    * chain in one match (the quantified group), so one application leaves
    * no `@`-adjacent class character on either side of a placeholder, and
    * a second application finds nothing. More aggressive by design: a
    * legitimate token abutting a redacted email via `@` is folded into
    * the placeholder (it could be part of the redacted address, and
    * fragment-free means fragment-free). */
  val fragmentRules: Seq[(String, String, String)] = Seq(
    ("email_domain_fragment", "\\[EMAIL\\](@[A-Za-z0-9.-]+)+", "[EMAIL]"),
    ("email_local_fragment", "([A-Za-z0-9._%+-]+@)+\\[EMAIL\\]", "[EMAIL]"))

  /** [[redact]] plus the fragment pass — fragment-free output for callers
    * who need no partial PII residue at all. Still one narrow codegen'd
    * projection (two extra regexp_replace builtins), still idempotent. */
  def redactExtended(text: Column): Column =
    fragmentRules.foldLeft(redact(text)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }

  /** Total redactions that [[redact]] performs on this text: counted
    * sequentially on the progressively-redacted text, matching the
    * replacement order exactly (an email containing digits is not
    * double-counted by the number rules once it is already `[EMAIL]`). */
  def redactionCount(text: Column): Column = {
    val (total, _) = rules.foldLeft((lit(0L), text)) {
      case ((acc, cur), (_, pat, repl)) =>
        (acc + regexp_count(cur, lit(pat)).cast("long"), regexp_replace(cur, pat, repl))
    }
    total
  }
}
