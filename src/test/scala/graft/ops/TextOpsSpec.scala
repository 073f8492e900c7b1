package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** The C4-style curation rewrites ([[LlmOps.piiScrub]],
  * [[LlmOps.dedupLines]]): planted PII is found and fully redacted
  * (zero residual matches), clean text is untouched, and the
  * boilerplate-line pass drops exactly the planted recurring lines
  * while body lines survive.
  */
class TextOpsSpec extends SparkTestBase {

  test("pii scrub: planted classes found, residual zero, clean docs clean") {
    val rows = LlmOps.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    val byName = rows.head.schema.fieldNames.zipWithIndex.toMap
    def l(r: Row, c: String): Long = r.getLong(byName(c))
    // Planting density: doc_id%7==0 → 1 email, %11==0 → 1 phone,
    // %13==0 → 2 IPs; sf0.001 has doc_ids 0..49.
    val nEmail = rows.map(l(_, "n_email")).sum
    val nPhone = rows.map(l(_, "n_phone")).sum
    val nIp = rows.map(l(_, "n_ip")).sum
    val nDocs = rows.map(l(_, "n_docs")).sum
    assert(nEmail == (0L until nDocs).count(_ % 7 == 0),
      "every planted email detected, nothing else matches")
    assert(nPhone == (0L until nDocs).count(_ % 11 == 0))
    assert(nIp == 2L * (0L until nDocs).count(_ % 13 == 0),
      "both IPs in a planted doc counted (global extract)")
    // The redaction audit: re-running the combined detector on the
    // scrubbed text finds NOTHING — redaction is total, corpus-wide.
    assert(rows.map(l(_, "n_residual")).sum == 0L,
      "scrubbed corpus has zero residual PII matches")
    // Docs with no planted PII stay byte-identical: a source whose
    // docs all avoid the plant moduli would have docs_with_pii <
    // n_docs; verify the census agrees with the plant arithmetic.
    val withPii = rows.map(l(_, "docs_with_pii")).sum
    assert(withPii ==
      (0L until nDocs).count(d => d % 7 == 0 || d % 11 == 0 || d % 13 == 0))
  }

  test("luhn pass: only checksum-VALID cards count and redact; " +
      "card-shaped noise survives untouched") {
    val rows = LlmOps.piiLuhn(spark, sf).collect()
    val byName = rows.head.schema.fieldNames.zipWithIndex.toMap
    def l(r: Row, c: String): Long = r.getLong(byName(c))
    val nDocs = rows.map(l(_, "n_docs")).sum
    val valid = (0L until nDocs).count(_ % 17 == 0)
    val invalid = (0L until nDocs).count(_ % 19 == 3)
    assert(rows.map(l(_, "n_card_shaped")).sum == valid + invalid,
      "every planted 16-digit run is a candidate")
    assert(rows.map(l(_, "n_valid")).sum == valid,
      "the Luhn check accepts exactly the valid plants — the bumped " +
        "last digit fails mod-10")
    assert(rows.map(l(_, "n_survivors")).sum == invalid,
      "redaction removes exactly the validated matches: invalid " +
        "card-shaped runs survive (incl. in docs carrying BOTH)")
  }

  test("line dedup: planted boilerplate dropped everywhere, bodies kept") {
    val rows = LlmOps.dedupLines(spark, sf).collect()
    val byName = rows.head.schema.fieldNames.zipWithIndex.toMap
    def l(r: Row, c: String): Long = r.getLong(byName(c))
    val nDocs = rows.map(l(_, "n_docs")).sum
    // Every planted line recurs in > 10 docs at every sf (smallest
    // modulus share is nDocs/5 = 10 docs at sf0.001 for %5==2 ...
    // which is exactly the threshold boundary: 0..49 has 10 docs with
    // doc_id%5==2, NOT > 10, so the banner SURVIVES at sf0.001 while
    // header (13 docs) and footer (17 docs) drop — the threshold
    // boundary is part of what this spec pins.
    val header = (0L until nDocs).count(_ % 4 == 0)  // 13 at sf0.001
    val footer = (0L until nDocs).count(_ % 3 == 0)  // 17
    val banner = (0L until nDocs).count(_ % 5 == 2)  // 10 — at threshold
    val expectRemoved =
      (if (header > 10) header else 0) +
      (if (footer > 10) footer else 0) +
      (if (banner > 10) banner else 0)
    assert(rows.map(l(_, "lines_removed")).sum == expectRemoved,
      s"exactly the over-threshold planted lines drop (h=$header f=$footer b=$banner)")
    // Body lines recur in at most the handful of exact-dup docs —
    // never > 10 — so every doc keeps a non-empty rebuilt text:
    // docs_touched counts only docs that LOST a line, and no source
    // loses more lines than it has docs with planted boilerplate.
    val touched = rows.map(l(_, "docs_touched")).sum
    val expectTouched = (0L until nDocs).count(d =>
      (header > 10 && d % 4 == 0) || (footer > 10 && d % 3 == 0) ||
        (banner > 10 && d % 5 == 2))
    assert(touched == expectTouched)
    val hLen = "subscribe to our newsletter for updates".length.toLong
    val fLen = "all rights reserved contact the webmaster".length.toLong
    val bLen = "click here to accept cookies".length.toLong
    assert(rows.map(l(_, "chars_removed")).sum ==
      (if (header > 10) header * hLen else 0L) +
      (if (footer > 10) footer * fLen else 0L) +
      (if (banner > 10) banner * bLen else 0L),
      "chars_removed = planted line lengths times their doc counts")
  }
}
