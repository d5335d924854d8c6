package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch expressions for near-duplicate detection at scale: MinHash
  * signatures (shingle-set similarity) and 64-bit SimHash fingerprints.
  *
  * Both are single-pass over the token array with zero per-row
  * allocation beyond the output, so a 100 TB corpus pays exactly one
  * narrow scan to sketch. Hash family: XXH64 on the token bytes (the
  * same hash Spark's own `xxhash64` exposes), diversified by a SplitMix64
  * sequence — deterministic across sessions/partitions by construction
  * (no RNG state, no Date/Random).
  */
object Sketches {

  /** SplitMix64 — public-domain mixing constants (Steele et al.,
    * "Fast splittable pseudorandom number generators", OOPSLA 2014).
    */
  private[functions] def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[functions] def hashToken(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** numHashes (a, b) parameter pairs for the h_i(x) = a_i·x + b_i
    * wrapping-64-bit universal family, compared unsigned.
    */
  private[functions] def coeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = splitmix64(2L * i) | 1L // odd multiplier
      b(i) = splitmix64(2L * i + 1)
      i += 1
    }
    (a, b)
  }

  def minhash(tokens: Column, numHashes: Int = 32): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), numHashes))

  def simhash(tokens: Column, portable: Boolean = false): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens), portable))

  /** mod-2^61−1 arithmetic shared by the rolling-hash family. */
  private[functions] final val P61 = (1L << 61) - 1

  /** (a·b) mod 2^61−1 without overflow, via Math.multiplyHigh:
    * 2^64 mod p = 8, so the 128-bit product folds in two mod steps.
    */
  private[functions] def mulModP61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val part = ((hi % P61) * 8) % P61
    (part + java.lang.Long.remainderUnsigned(lo, P61)) % P61
  }

  /** Rabin–Karp h = Σ bᵢ·131^i mod 2^61−1 over the UTF-8 bytes — the
    * exact chain [[RollingHash64]] exposes, factored out so the
    * portable SimHash token hash is byte-identical with the DuckDB
    * oracle's `list_reduce` mirror (see DedupQueries' dedup_simhash).
    */
  private[functions] def rollingHash61(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      h = (h + mulModP61(bytes(i) & 0xFFL, pow)) % P61
      pow = mulModP61(pow, 131L)
      i += 1
    }
    h
  }

  /** Salt for the portable token hash's high word: Knuth's MMIX LCG
    * increment (public domain), chosen < 2^61 so the salted value stays
    * inside IdHash's full-mixing domain [0, 2^62).
    */
  private[functions] final val PortableSalt = 0x14057B7EF767814FL

  /** Oracle-portable 64-bit token hash: t = rollingHash61(token), low
    * word = IdHash v3 of t, high word = IdHash v3 of (t xor salt).
    * Every step is exact integer arithmetic a DuckDB oracle reproduces
    * (HUGEINT list_reduce for t, the SamplingQueries.hashSql chain for
    * the two words) — the hash family [[SimHash64]]'s `portable` mode
    * votes with. XXH64 remains the default family: one multiply per
    * 8 bytes vs. one mulMod per byte here, so portable mode is for
    * oracle-verified catalogs, not the 100 TB hot path.
    */
  private[functions] def portableTokenHash(tok: UTF8String): Long = {
    val t = rollingHash61(tok)
    (IdHash.hash(t ^ PortableSalt) << 32) | IdHash.hash(t)
  }

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** `size(array_intersect(a, b))` for sorted-distinct bigint arrays,
    * zero-allocation — see [[SortedLongIntersectSize]].
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedLongIntersectSize(
      Bridge.expression(a), Bridge.expression(b)))

  def signSketch(vec: Column): Column =
    Bridge.column(SignSketch64(Bridge.expression(vec)))

  /** Width-parameterized sign sketch: `words`×64 random hyperplanes as
    * `array<long>`. Word 0 is bit-identical to [[signSketch]] (same
    * plane family), so widening a sketch never changes the bits a
    * narrower consumer already banded on.
    */
  def signSketchWide(vec: Column, words: Int): Column =
    Bridge.column(SignSketchWide(Bridge.expression(vec), words))

  def rollingHash(s: Column): Column =
    Bridge.column(RollingHash64(Bridge.expression(s)))

  def winnowSet(s: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowSet(Bridge.expression(s), k, w))

  def gramHashes(s: Column, k: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(s), k))
}

/** Polynomial rolling hash (Rabin–Karp) of a string's UTF-8 bytes:
  * h = Σ bᵢ·B^i mod p with B = 131, p = 2⁶¹−1 — the document
  * fingerprint primitive (content-defined chunking, plagiarism windows).
  * Single pass, no allocation.
  */
case class RollingHash64(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Sketches.rollingHash61(input.asInstanceOf[UTF8String]))

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm): hash every k-char window with a
  * Rabin–Karp rolling hash, then in every window of `w` consecutive
  * hashes select the minimum (rightmost on ties), recording each newly
  * selected position once. Guarantee: any shared substring of length
  * ≥ w + k − 1 between two documents shares at least one selected
  * fingerprint, while only ~2/(w+1) of all window hashes are kept —
  * the sub-linear fingerprint set near-dup detection over long
  * documents wants. Output: the selected hashes, distinct, ascending
  * (a canonical set — document order doesn't survive, matching use as
  * a set-membership fingerprint).
  */
case class WinnowSet(child: Expression, k: Int, w: Int)
    extends UnaryExpression with KernelCodegen {

  require(k >= 1, "k-gram size must be >= 1")
  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_set"

  private final val P = (1L << 61) - 1
  private final val B = 131L

  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val part = ((hi % P) * 8) % P
    (part + java.lang.Long.remainderUnsigned(lo, P)) % P
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // leading-byte-highest-power orientation rolls in O(1):
    // h_{i+1} = (h_i − b_i·B^{k−1})·B + b_{i+k}
    var powK1 = 1L
    var j = 0
    while (j < k - 1) { powK1 = mulMod(powK1, B); j += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    j = 0
    while (j < k) { h = (mulMod(h, B) + (bytes(j) & 0xFFL)) % P; j += 1 }
    hashes(0) = h
    var i = 1
    while (i < n) {
      h = (h - mulMod(bytes(i - 1) & 0xFFL, powK1) % P + P) % P
      h = (mulMod(h, B) + (bytes(i + k - 1) & 0xFFL)) % P
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum per w-window, each position once
    val selected = new java.util.TreeSet[java.lang.Long]()
    val windows = math.max(1, n - w + 1)
    var lastIdx = -1
    var p = 0
    while (p < windows) {
      val end = math.min(p + w, n)
      var minIdx = p
      var q = p + 1
      while (q < end) { if (hashes(q) <= hashes(minIdx)) minIdx = q; q += 1 }
      if (minIdx != lastIdx) { selected.add(hashes(minIdx)); lastIdx = minIdx }
      p += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSet =
    copy(child = newChild)
}

/** Every k-byte window hash of a string, in document order: element
  * i−1 (0-based) is the Rabin–Karp hash of bytes [i, i+k) — the same
  * leading-byte-highest-power mod-2^61−1 chain [[WinnowSet]] selects
  * minima from, exposed whole so position-level duplicate detection
  * (exact-substring dedup à la Lee et al. 2021) can join positions by
  * hash. O(n) per row via the rolling recurrence
  * h_{i+1} = (h_i − b_i·B^{k−1})·B + b_{i+k}; a string shorter than k
  * yields an empty array. For ASCII text the byte positions this
  * reports are also character positions, which is what lets a DuckDB
  * oracle reproduce the array with per-character substring folds.
  */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {

  require(k >= 1, "k-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  private final val P = (1L << 61) - 1
  private final val B = 131L

  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val part = ((hi % P) * 8) % P
    (part + java.lang.Long.remainderUnsigned(lo, P)) % P
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    var powK1 = 1L
    var j = 0
    while (j < k - 1) { powK1 = mulMod(powK1, B); j += 1 }
    val out = new Array[Any](n)
    var h = 0L
    j = 0
    while (j < k) { h = (mulMod(h, B) + (bytes(j) & 0xFFL)) % P; j += 1 }
    out(0) = h
    var i = 1
    while (i < n) {
      h = (h - mulMod(bytes(i - 1) & 0xFFL, powK1) % P + P) % P
      h = (mulMod(h, B) + (bytes(i + k - 1) & 0xFFL)) % P
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** Codegen support for kernel-style unary expressions: the child is
  * compiled into whole-stage codegen and the generated code calls the
  * expression's `kernelPublic` once per row. This avoids the
  * CodegenFallback trap of re-evaluating the ENTIRE subtree interpreted
  * — for the sketches the child is a higher-order-function shingling
  * chain, which interpreted eval walks lambda-by-lambda per row.
  */
trait KernelCodegen extends UnaryExpression {
  /** Public so generated Java can call it. Input is the non-null child
    * value in Catalyst internal form.
    */
  def kernelPublic(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val ref = ctx.addReferenceObj("kernel", this, classOf[KernelCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val call = s"$ref.kernelPublic($c)"
      dataType match {
        case LongType => s"${ev.value} = ((java.lang.Long) $call).longValue();"
        case DoubleType => s"${ev.value} = ((java.lang.Double) $call).doubleValue();"
        case _ => s"${ev.value} = (${CodeGenerator.javaType(dataType)}) $call;"
      }
    })
  }
}

/** MinHash signature of a token/shingle array: for each of `numHashes`
  * hash functions, the unsigned-min over tokens of
  * h_i(xxh64(token)) = a_i·x + b_i (wrap-around 64-bit). Null tokens are
  * skipped; an empty array yields a signature of Long.MaxValue sentinels
  * (never collides with real content across bands).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val (ca, cb) = Sketches.coeffs(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t)
      if (tok != null) {
        val x = Sketches.hashToken(tok, 42L)
        var i = 0
        while (i < numHashes) {
          val h = ca(i) * x + cb(i)
          if (java.lang.Long.compareUnsigned(h, sig(i)) < 0) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-bit vote of each token's
  * hash, sign-thresholded. Hamming distance between fingerprints
  * approximates cosine distance of the bag-of-token vectors.
  *
  * Token-hash family is a parameter: XXH64 (default — fastest, the
  * 100 TB path) or the oracle-portable rolling-hash/IdHash chain
  * ([[Sketches.portableTokenHash]]), which a DuckDB oracle reproduces
  * exactly — that is how the dedup_simhash catalog query is verified
  * end-to-end rather than only golden-pinned. The banding/verify
  * structure above the fingerprint is hash-agnostic.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t)
      if (tok != null) {
        val h = if (portable) Sketches.portableTokenHash(tok)
                else Sketches.hashToken(tok, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 64-bit random-hyperplane sign sketch of a numeric vector (Charikar,
  * "Similarity estimation techniques from rounding algorithms", STOC
  * 2002 — the cosine-LSH family): bit j = sign(v · h_j) for 64
  * deterministic pseudo-random hyperplanes, components SplitMix64-mapped
  * to [-1, 1) (symmetric, which is all sign-LSH needs; no RNG state, so
  * sketches are identical across sessions/partitions). Hamming distance
  * between sketches estimates the angle: collinear vectors sketch
  * IDENTICALLY regardless of scale — the near-duplicate signal.
  * Accepts array<float> or array<double> input.
  */
case class SignSketch64(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_sketch64"

  private def plane(j: Int, i: Int): Double = {
    val v = Sketches.splitmix64(j.toLong * 131071L + i.toLong)
    (v >>> 11) * (2.0 / (1L << 53)) - 1.0
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var out = 0L
    var j = 0
    while (j < 64) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * plane(j, i)
        i += 1
      }
      if (dot > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignSketch64 =
    copy(child = newChild)
}

/** [[SignSketch64]] at arbitrary width: `words`×64 hyperplanes, output
  * `array<long>` with word w holding planes [64w, 64w+64). The plane
  * family is IDENTICAL to SignSketch64's (same splitmix64 stream), so
  * element 0 of the wide sketch equals the 64-bit sketch exactly —
  * spec-pinned. Width is the sign-LSH SCALE knob: bucket count per
  * band is 2^chunkBits, and keeping candidate volume ~linear needs
  * 2^chunkBits to grow with N — which costs recall radius unless the
  * sketch widens with it (radius = bands − 1 = words·64/chunkBits − 1
  * differing bits).
  */
case class SignSketchWide(child: Expression, words: Int)
    extends UnaryExpression with KernelCodegen {

  require(words >= 1 && words <= 16, s"words must be in [1,16]: $words")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketch_wide"

  private def plane(j: Int, i: Int): Double = {
    val v = Sketches.splitmix64(j.toLong * 131071L + i.toLong)
    (v >>> 11) * (2.0 / (1L << 53)) - 1.0
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](words)
    var w = 0
    while (w < words) {
      var bits = 0L
      var j = 0
      while (j < 64) {
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * plane(w * 64 + j, i)
          i += 1
        }
        if (dot > 0) bits |= (1L << j)
        j += 1
      }
      out(w) = bits
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignSketchWide =
    copy(child = newChild)
}

/** Cosine similarity of two double arrays in one fused pass (dot and
  * both norms accumulated together) — the hot inner loop of brute-force
  * similarity search, where three separate higher-order-function
  * evaluations per pair would dominate runtime. Implements `doGenCode`
  * so the loop inlines into whole-stage codegen (the brute-force path
  * evaluates this O(|Q|·N) times). Returns null on null or
  * length-mismatched inputs; 0 when either vector is all-zero.
  */
/** |a ∩ b| for two SORTED (ascending, signed), element-DISTINCT
  * bigint arrays — the Jaccard-verify kernel. Replaces
  * `size(array_intersect(a, b))`, which builds a hash set PER
  * EVALUATION (the dominant allocator of the dedup verify stages:
  * two set structures plus a result array per candidate pair, ~tens
  * of KB per call at catalog shingle-set sizes); this is a single
  * zero-allocation merge walk, O(|a| + |b|).
  *
  * Precondition (holds at every call site by construction — the sets
  * are `array_sort(array_distinct(...))`-built): both arrays sorted
  * ascending with nulls last, elements distinct within each array.
  * On such inputs the result is bit-identical to
  * `size(array_intersect(a, b))`, including the both-contain-null
  * case (counted once). Unsorted input is NOT detected.
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val ea = ctx.freshName("ea")
      val eb = ctx.freshName("eb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $ea = $a.numElements();
        int $eb = $b.numElements();
        boolean ${c}HasNullA = false, ${c}HasNullB = false;
        while ($ea > 0 && $a.isNullAt($ea - 1)) { $ea--; ${c}HasNullA = true; }
        while ($eb > 0 && $b.isNullAt($eb - 1)) { $eb--; ${c}HasNullB = true; }
        int $i = 0, $j = 0, $c = 0;
        while ($i < $ea && $j < $eb) {
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x == $y) { $c++; $i++; $j++; }
          else if ($x < $y) { $i++; } else { $j++; }
        }
        ${ev.value} = (${c}HasNullA && ${c}HasNullB) ? $c + 1 : $c;
      """
    })
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var ea = a.numElements(); var hasNullA = false
    while (ea > 0 && a.isNullAt(ea - 1)) { ea -= 1; hasNullA = true }
    var eb = b.numElements(); var hasNullB = false
    while (eb > 0 && b.isNullAt(eb - 1)) { eb -= 1; hasNullB = true }
    var i = 0; var j = 0; var c = 0
    while (i < ea && j < eb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(if (hasNullA && hasNullB) c + 1 else c)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersectSize =
    copy(left = l, right = r)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** Always nullable: null is returned on length-mismatched inputs even
    * when both children are non-nullable — and the codegen below
    * assigns `isNull = true`, which would be the invalid Java
    * `false = true;` if nullable were derived as false (nullSafeCodeGen
    * inlines isNull as a literal for non-nullable children).
    */
  override def nullable: Boolean = true

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = ($na == 0.0 || $nb == 0.0)
            ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}
