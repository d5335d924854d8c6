package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Refresh discipline for the embedded public-suffix subset (round-16
  * verdict task 8): the shipped list's provenance is a dated manual
  * PSL distillation, so drift must be LOUD. Two layers:
  *
  *   - a CANARY set written independently of the shipped constant
  *     (re-typed from publicsuffix.org's ICANN section, not
  *     copy-pasted from TextFunctions) — every canary must be
  *     present, so an accidental deletion fails here;
  *   - the full list's sorted fingerprint — ANY edit (add, remove,
  *     typo) fails until the editor re-verifies the canaries against
  *     the live PSL and bumps the fingerprint together with the
  *     provenance date in the scaladoc.
  */
class SuffixListSpec extends AnyFunSuite {

  // independently re-typed from the PSL ICANN section (NOT a reference
  // to TextFunctions.DefaultMultiPartSuffixes) — the cross-check that
  // catches a silently edited constant
  private val canaries = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "gov.au", "co.jp", "go.jp",
    "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "com.tr", "com.hk", "com.tw",
    "co.za", "co.kr", "com.sg")

  test("every canary suffix is in the shipped list") {
    val shipped = TextFunctions.DefaultMultiPartSuffixes.toSet
    val missing = canaries.filterNot(shipped)
    assert(missing.isEmpty,
      s"canary suffixes missing from DefaultMultiPartSuffixes: $missing " +
        "— if deliberate, re-verify against publicsuffix.org and update " +
        "BOTH this spec and the provenance date in TextFunctions")
  }

  test("shipped list fingerprint is pinned (edits must be deliberate)") {
    val sorted = TextFunctions.DefaultMultiPartSuffixes.sorted
    assert(sorted.size == sorted.distinct.size,
      s"duplicates: ${sorted.diff(sorted.distinct)}")
    val fp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sorted.mkString("\n").getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    // pinned 2026-08-15 against the PSL ICANN section; on a deliberate
    // list update: re-verify canaries, recompute this value, and bump
    // the provenance date in TextFunctions.DefaultMultiPartSuffixes
    assert(TextFunctions.DefaultMultiPartSuffixes.size == 41 &&
      fp == SuffixListSpec.PinnedFingerprint,
      s"suffix list changed: size=${sorted.size} fingerprint=$fp — " +
        "follow the refresh discipline in the scaladoc")
  }

  test("every shipped suffix is structurally a multi-part suffix " +
      "(two dot-separated ASCII labels)") {
    val bad = TextFunctions.DefaultMultiPartSuffixes
      .filterNot(_.matches("[a-z]{2,4}\\.[a-z]{2,3}"))
    assert(bad.isEmpty, s"malformed entries: $bad")
  }
}

object SuffixListSpec {
  val PinnedFingerprint = "5294a081627a534b"
}
