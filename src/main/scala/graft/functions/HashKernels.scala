package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop JVM kernels behind the custom dedup expressions
  * (HashExpressions). Called from generated code via static forwarders, so
  * the hashing stays inside whole-stage codegen with zero boxing — the
  * HOF-composition equivalents in HashFunctions are ~50× slower because
  * every lambda element evaluates interpreted.
  *
  * Semantics are identical to HashFunctions (seed-7, 31-ary polynomial
  * rolling hash mod P over Unicode code points; affine MinHash family;
  * sign-vote SimHash) and to the DuckDB oracle SQL — covered by a
  * cross-check spec.
  */
object HashKernels {

  val P = 1000000007L

  private def codepoints(s: UTF8String): Array[Int] = s.toString.codePoints.toArray

  /** Rolling polynomial hash over all code points of s. */
  def rollingHash(s: UTF8String): Long = {
    val cps = codepoints(s)
    var acc = 7L
    var i = 0
    while (i < cps.length) { acc = (acc * 31L + cps(i)) % P; i += 1 }
    acc
  }

  /** Rolling hash of each string element of arr. */
  def rollingHashArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = rollingHash(arr.getUTF8String(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct rolling hashes of all char n-shingles (first-occurrence order);
    * one pass over the code points, no shingle strings materialized.
    */
  def shingleHashSet(s: UTF8String, n: Int): ArrayData = {
    val cps = codepoints(s)
    if (cps.length < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val nWin = cps.length - n + 1
    // primitive open-addressed dedup + order-preserving append (r18):
    // the LinkedHashSet form boxed every window hash of every doc —
    // this kernel runs once per doc per signature/gram build, so the
    // boxing was a fixed tax on ALL minhash/decontam scans. Output order
    // (first occurrence) is unchanged.
    val dd = new LongDedup(nWin)
    var i = 0
    while (i < nWin) {
      var acc = 7L
      var j = i
      while (j < i + n) { acc = (acc * 31L + cps(j)) % P; j += 1 }
      dd.addIfAbsent(acc)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(dd.result())
  }

  /** Order-preserving primitive long dedup (open addressing, no boxing) —
    * shared by the per-doc hash-set kernels. `expected` sizes the probe
    * table; `result()` returns first-occurrence order exactly like the
    * LinkedHashSet it replaced.
    */
  private final class LongDedup(expected: Int) {
    private var cap = 4
    while (cap < expected * 2) cap <<= 1
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val used = new Array[Boolean](cap)
    private val order = new Array[Long](expected max 1)
    private var n = 0
    def addIfAbsent(v: Long): Unit = {
      var h = v * -7046029254386353131L
      h ^= (h >>> 32)
      var idx = (h & mask).toInt
      while (used(idx) && keys(idx) != v) idx = (idx + 1) & mask
      if (!used(idx)) {
        used(idx) = true; keys(idx) = v
        order(n) = v; n += 1
      }
    }
    def result(): Array[Long] =
      if (n == order.length) order else java.util.Arrays.copyOf(order, n)
  }

  /** MinHash signature: sig(i) = min over h of (8191·i·h + 524287·i) mod P
    * for i in 1..k; empty input → all-P sentinels.
    */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 8191L * (i + 1)
      val b = 524287L * (i + 1)
      var mn = P
      var j = 0
      while (j < n) {
        val v = (a * hashes.getLong(j) + b) % P
        if (v < mn) mn = v
        j += 1
      }
      out(i) = mn
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 32-bit SimHash (term-frequency weighted sign votes per bit). */
  def simhash32(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](32)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** `bits`-bit SimHash (bits ≤ 62). Token hashes are polynomial folds mod
    * P ≈ 2^30, so RAW bits beyond ~30 carry no signal — each output bit b
    * votes on the PARITY of a per-bit affine rehash
    * g_b(h) = (8191·(b+1)·h + 524287·(b+1)) mod P instead (the minhash
    * permutation family), giving `bits` independent votes per token.
    * Wider fingerprints buy proportionally wider blocking bands: 4×15-bit
    * bands cut candidate volume 32768× per band vs 256× for byte bands,
    * while the 4-band pigeonhole guarantee for Hamming ≤ 3 is unchanged.
    */
  def simhashBits(hashes: ArrayData, bits: Int): Long = {
    // SQL-exposed via simhash_bits(expr, n): bits > 62 would silently wrap
    // the Long shift (1L << 64 == 1L) and emit corrupt fingerprints.
    require(bits >= 1 && bits <= 62, s"simhashBits: bits must be in [1, 62], got $bits")
    val n = hashes.numElements()
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < bits) {
        val g = (8191L * (b + 1) * h + 524287L * (b + 1)) % 1000000007L
        if ((g & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Rolling hash of every whitespace token of a NORMALIZED string (single
    * spaces, no leading/trailing) whose codepoint length lies in
    * [minLen, maxLen] — tokenize + hash fused into one pass, no token
    * strings. Equivalent to rollingHashArray(tokens(s, minLen, maxLen)).
    */
  def tokenHashes(s: UTF8String, minLen: Int, maxLen: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val it = s.toString.codePoints.iterator()
    var acc = 7L
    var len = 0
    while (it.hasNext) {
      val cp = it.nextInt()
      if (cp == ' ') {
        if (len >= minLen && len <= maxLen) out += acc
        acc = 7L; len = 0
      } else {
        acc = (acc * 31L + cp) % P
        len += 1
      }
    }
    if (len >= minLen && len <= maxLen) out += acc
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  /** Distinct polynomial hashes of all length-n windows of a BIGINT array —
    * token n-grams as join keys without ever materializing the gram strings
    * (feed it rollingHashArray(tokens)).
    */
  def windowHashSet(hashes: ArrayData, n: Int): ArrayData = {
    val m = hashes.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    // same primitive dedup as shingleHashSet (r18) — this kernel is the
    // 13-gram hash stream of every decontam scan
    val nWin = m - n + 1
    val dd = new LongDedup(nWin)
    var i = 0
    while (i < nWin) {
      var acc = 7L
      var j = i
      while (j < i + n) { acc = (acc * 31L + hashes.getLong(j)) % P; j += 1 }
      dd.addIfAbsent(acc)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(dd.result())
  }

  /** POSITIONAL polynomial hashes of all length-n windows of a BIGINT array —
    * element i is the hash of the window starting at i (no dedup, unlike
    * windowHashSet), so array position doubles as the span start offset.
    * Feed it tokenHashes(...) for token-gram spans: the substring-dedup tier
    * needs WHERE a duplicated gram sits, not just that it exists.
    */
  def windowHashList(hashes: ArrayData, n: Int): ArrayData = {
    val m = hashes.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i + n <= m) {
      var acc = 7L
      var j = i
      while (j < i + n) { acc = (acc * 31L + hashes.getLong(j)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Open-addressed primitive long set shared by the per-pair set kernels
    * below (r18): the boxed java.util.HashSet[java.lang.Long] form
    * allocated + boxed every element of BOTH arrays once per candidate
    * PAIR — for the banded dedup faces that is (pairs × set sizes) boxed
    * inserts, the dominant per-task cost of the exact-Jaccard re-rank
    * (guide §1.2 step 2). Linear-probe table with tags: 1 = in A,
    * 2 = in B only, 3 = both. Returns are value-identical to the boxed
    * form — the counts are set-algebra, not iteration-order-dependent.
    * Sentinel-free: `used` marks occupancy, so any long key (including
    * Long.MinValue) is representable.
    */
  @inline private def probeSlot(keys: Array[Long], used: Array[Boolean],
                                mask: Int, v: Long): Int = {
    // finalizer-mixed hash spreads mod-P-clustered shingle hashes
    var h = v * -7046029254386353131L
    h ^= (h >>> 32)
    var idx = (h & mask).toInt
    while (used(idx) && keys(idx) != v) idx = (idx + 1) & mask
    idx
  }

  /** Jaccard similarity of two BIGINT arrays treated as sets (same value
    * as size(intersect)/size(union) of the distinct inputs).
    */
  def jaccardLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var cap = 4
    while (cap < (na + nb) * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val tag = new Array[Byte](cap)
    var sizeA = 0
    var i = 0
    while (i < na) {
      val v = a.getLong(i)
      val idx = probeSlot(keys, used, mask, v)
      if (!used(idx)) {
        used(idx) = true; keys(idx) = v; tag(idx) = 1; sizeA += 1
      }
      i += 1
    }
    var sizeB = 0
    var inter = 0
    i = 0
    while (i < nb) {
      val v = b.getLong(i)
      val idx = probeSlot(keys, used, mask, v)
      if (!used(idx)) {
        used(idx) = true; keys(idx) = v; tag(idx) = 2; sizeB += 1
      } else if (tag(idx) == 1) {
        tag(idx) = 3; inter += 1; sizeB += 1
      }
      i += 1
    }
    val union = sizeA + sizeB - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Max directional containment of two long-hash sets:
    * |A∩B| / min(|A|, |B|) ≡ max(|A∩B|/|A|, |A∩B|/|B|) — the two forms are
    * bit-identical because correctly-rounded IEEE division is monotonic in
    * the divisor, so the DuckDB oracle's greatest(i/|A|, i/|B|) matches.
    * One pass, no intersection array allocated (vs array_intersect +
    * greatest, which built the intersection per pair).
    */
  def containmentLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0
    // same primitive open-addressed table as jaccardLong (r18) — the
    // boxed-HashSet form was the per-pair hot loop of the containment face
    var cap = 4
    while (cap < (na + nb) * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val tag = new Array[Byte](cap)
    var sizeA = 0
    var i = 0
    while (i < na) {
      val v = a.getLong(i)
      val idx = probeSlot(keys, used, mask, v)
      if (!used(idx)) {
        used(idx) = true; keys(idx) = v; tag(idx) = 1; sizeA += 1
      }
      i += 1
    }
    var sizeB = 0
    var inter = 0
    i = 0
    while (i < nb) {
      val v = b.getLong(i)
      val idx = probeSlot(keys, used, mask, v)
      if (!used(idx)) {
        used(idx) = true; keys(idx) = v; tag(idx) = 2; sizeB += 1
      } else if (tag(idx) == 1) {
        tag(idx) = 3; inter += 1; sizeB += 1
      }
      i += 1
    }
    val m = math.min(sizeA, sizeB)
    if (m == 0) 0.0 else inter.toDouble / m
  }

  /** Left-to-right dot product of two double arrays (same fold order as
    * VectorFunctions.dot and the DuckDB oracle's list_reduce → bit-identical
    * doubles across engines).
    */
  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** v / ‖v‖₂ (zero vector stays zero). Norm is the left-fold sum of squares
    * then sqrt — same arithmetic as the oracle's CTE, so downstream dot
    * products are bit-identical cross-engine.
    */
  def unitVector(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Banded random-hyperplane LSH: band j packs `bits` sign bits
    * (bit i = sign(v · plane_{j·bits+i})) into one Long band value. Planes
    * come from a 3-round MINSTD LCG over the plane/dim index,
    * h = f³(p·131 + d + 1) with f(x) = (48271·x + 524287) mod P, centered at
    * (P−1)/2 — pure arithmetic, so the oracle regenerates identical planes.
    *
    * Three rounds matter: ONE round is affine in (p,d) for every argument
    * below P/48271, which makes all planes the same direction plus a
    * constant shift — the sketch bits then all threshold a single scalar
    * and banding cannot cut candidates at all (measured: every band config
    * kept ~50% of all pairs as candidates). Round 2 wraps mod P on every
    * plane step and round 3 mixes within-plane structure; the resulting
    * bits are balanced (0.45–0.54 ones-rate on the embeddings fixture) and
    * band-independent. Dots accumulate in index order (bit-identical
    * cross-engine).
    */
  /** Plane rows are pure functions of (plane index, dim) — memoized per
    * JVM so the hot loops are FMA over a precomputed matrix instead of
    * three modular multiplies per (plane, dim) per ROW. At 256-dim
    * signatures × 272 plane-bits the per-row LCG was ~630k integer ops —
    * the 30× media probe spent ~10 min regenerating constants (measured;
    * the cache returns the pass to flop-bound). Values are bit-identical:
    * the cache stores exactly the f³ constants the inline loop produced.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planesFor(startIdx: Int, count: Int,
                        dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((startIdx, count, dim), _ => {
      val m = Array.ofDim[Double](count, dim)
      var k = 0
      while (k < count) {
        val p = startIdx + k
        var d = 0
        while (d < dim) {
          var h = (48271L * (p * 131L + d + 1) + 524287L) % P
          h = (48271L * h + 524287L) % P
          h = (48271L * h + 524287L) % P
          m(k)(d) = h.toDouble - 500000003.0
          d += 1
        }
        k += 1
      }
      m
    })

  def planeBands(v: ArrayData, bands: Int, bits: Int): ArrayData = {
    require(bits >= 1 && bits <= 62, s"planeBands: bits must be in [1, 62], got $bits")
    val n = v.numElements()
    val planes = planesFor(0, bands * bits, n)
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var word = 0L
      var i = 0
      while (i < bits) {
        val plane = planes(j * bits + i)
        var acc = 0.0
        var d = 0
        while (d < n) {
          acc += v.getDouble(d) * plane(d)
          d += 1
        }
        if (acc > 0) word |= (1L << i)
        i += 1
      }
      out(j) = word
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** v − mean(v): removes the all-positive cone of count histograms so
    * random-hyperplane LSH gets sign-balanced inputs (an uncentered
    * histogram family lives in the positive orthant where every pairwise
    * cosine is ≥ 0 and band collisions are dense — measured on the media
    * signatures: centering + 8-byte windows moved the cross-doc median
    * cosine from 0.68 to 0.11 while true near-dups stay ≥ 0.9). The mean
    * is the index-order left-fold sum / n — bit-identical cross-engine.
    */
  def centerVector(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    if (n > 0) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getDouble(i); i += 1 }
      val m = acc / n
      i = 0
      while (i < n) { out(i) = a.getDouble(i) - m; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Deterministic random-plane projection: out[o] = v · plane_{seed+o},
    * planes from the SAME 3-round MINSTD LCG family as `planeBands`
    * (h = f³(p·131 + d + 1), centered) — `seed` offsets the plane index so
    * a projection never shares a plane with any band sketch (band plane
    * indices stay below bands·bits ≤ 480). This is the stub cross-modal
    * encoder of the multimodal tier: a fixed linear map into the embedding
    * space with the same shape (and oracle-mirrorability) a learned
    * projection head would have. Dots accumulate in index order
    * (bit-identical cross-engine).
    */
  def planeProject(v: ArrayData, outDim: Int, seed: Int): ArrayData = {
    val n = v.numElements()
    val planes = planesFor(seed, outDim, n)
    val out = new Array[Double](outDim)
    var o = 0
    while (o < outDim) {
      val plane = planes(o)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += v.getDouble(d) * plane(d)
        d += 1
      }
      out(o) = acc
      o += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Polynomial hash of each length-`rows` band of a signature. */
  def lshBands(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var acc = 7L
      var r = 0
      while (r < rows) { acc = (acc * 31L + sig.getLong(j * rows + r)) % P; r += 1 }
      out(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
