package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing (Schleimer et al. 2003): the published guarantees, not
  * just determinism — selection density ~2/(w+1), and the match
  * guarantee that any shared substring of length ≥ w + k − 1 yields a
  * shared fingerprint.
  */
class WinnowSpec extends SparkSpec {

  private def winnow(text: String, k: Int, w: Int): Seq[Long] = {
    val e = WinnowSet(Literal(text), k, w)
    e.nullSafeEval(UTF8String.fromString(text)).asInstanceOf[ArrayData]
      .toLongArray().toSeq
  }

  private def kgramHashes(text: String, k: Int): Set[Long] = {
    // reference: hash every k-gram independently with the same
    // polynomial (leading byte highest power)
    val P = (BigInt(1) << 61) - 1
    text.getBytes("UTF-8").sliding(k).filter(_.length == k).map { g =>
      g.foldLeft(BigInt(0))((h, b) => (h * 131 + (b & 0xFF)) mod P).toLong
    }.toSet
  }

  test("selected fingerprints are a sorted distinct subset of all k-gram hashes") {
    val text = "the quick brown fox jumps over the lazy dog and the cat"
    val sel = winnow(text, 5, 4)
    assert(sel == sel.distinct.sorted)
    assert(sel.toSet.subsetOf(kgramHashes(text, 5)))
    assert(sel.nonEmpty)
  }

  test("identical documents select identical fingerprints") {
    val a = winnow("some document content here", 4, 3)
    val b = winnow("some document content here", 4, 3)
    assert(a == b)
  }

  test("match guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    val k = 5; val w = 4
    val shared = "zzQQshared-fragment-hereQQzz" // length 28 >= w+k-1 = 8
    val doc1 = s"first document prefix $shared and a suffix"
    val doc2 = s"totally different beginning $shared other ending"
    val f1 = winnow(doc1, k, w).toSet
    val f2 = winnow(doc2, k, w).toSet
    assert(f1.intersect(f2).nonEmpty,
      "winnowing must fingerprint a shared substring of guarantee length")
  }

  test("unrelated documents share no fingerprints") {
    val f1 = winnow("aaaa bbbb cccc dddd eeee", 5, 4).toSet
    val f2 = winnow("1111 2222 3333 4444 5555", 5, 4).toSet
    assert(f1.intersect(f2).isEmpty)
  }

  test("density is ~2/(w+1), far below the k-gram count") {
    // high-entropy content (fixed seed): the output is a DISTINCT set,
    // so any repeated k-gram would dedupe selections and undershoot
    // the published position density
    val rnd = new scala.util.Random(42)
    val text = Seq.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val k = 8; val w = 16
    val sel = winnow(text, k, w)
    val total = text.length - k + 1
    val density = sel.size.toDouble / total
    assert(density < 3.0 / (w + 1), s"density $density vs bound ${3.0 / (w + 1)}")
    assert(density > 0.5 / (w + 1), s"density $density suspiciously low")
  }

  test("short text: fewer than k chars yields empty; exactly k yields one") {
    assert(winnow("ab", 5, 4).isEmpty)
    assert(winnow("abcde", 5, 4).size == 1)
  }
}
