package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashExpressions => K, HashFunctions => H}
import graft.functions.VectorFunctions

/** The codegen'd hash kernels (HashExpressions/HashKernels) must agree
  * bit-for-bit with the interpreted HOF reference implementations
  * (HashFunctions) — the HOF forms are also what the DuckDB oracle SQL
  * mirrors, so this equivalence is what anchors the oracle checks.
  */
class HashKernelsSpec extends SparkSuite {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "인공지능 모델 학습 데이터 인공지능",
    "aaaaa", "ab", "", "x y z zz yy xx the the the")

  private def col1(df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().toSeq.map(_.get(0))

  test("rollingHash kernel == HOF fold") {
    val df = texts.toDF("t")
    val k = col1(df.select(K.rollingHash(col("t"))))
    val h = col1(df.select(H.rollingHash(col("t"))))
    assert(k == h)
  }

  test("rollingHash known value: fold over code points") {
    // "ab" -> ((7*31+97)%P)*31+98 % P = (314*31+98) = 9832
    val r = col1(Seq("ab").toDF("t").select(K.rollingHash(col("t"))))
    assert(r == Seq(9832L))
  }

  test("shingleHashSet kernel == HOF window fold over codepoints") {
    val df = texts.toDF("t")
    val kern = col1(df.select(K.shingleHashSet(col("t"), 5)))
      .map(_.asInstanceOf[scala.collection.Seq[Long]].toSet)
    val hof = col1(df.select(
      H.shingleHashSet(col("t"), 5))).map(_.asInstanceOf[scala.collection.Seq[Long]].toSet)
    assert(kern == hof)
  }

  test("minhashSig kernel == HOF affine-min; sentinel for empty input") {
    val df = texts.toDF("t")
    val kern = col1(df.select(
      K.minhashSig(K.shingleHashSet(col("t"), 3), 16)))
    val hof = col1(df.select(
      H.minhashSignature(K.shingleHashSet(col("t"), 3), 16)))
    assert(kern == hof)
    val empty = col1(Seq("ab").toDF("t")
      .select(K.minhashSig(K.shingleHashSet(col("t"), 3), 4)))
    assert(empty == Seq(Seq.fill(4)(H.P)))
  }

  test("simhash32 kernel == HOF sign-vote") {
    val df = texts.filter(_.nonEmpty).toDF("t")
    val toks = graft.functions.TextFunctions.tokens(col("t"), 1, 100)
    val kern = col1(df.select(K.simhash32(K.rollingHashArray(toks))))
    val hof = col1(df.select(H.simhash(K.rollingHashArray(toks))))
    assert(kern == hof)
  }

  test("simhashBits(60) kernel == HOF affine-parity vote") {
    val df = texts.filter(_.nonEmpty).toDF("t")
    val toks = graft.functions.TextFunctions.tokens(col("t"), 1, 100)
    val kern = col1(df.select(K.simhashK(K.rollingHashArray(toks), 60)))
    val hof = col1(df.select(H.simhashBitsHof(K.rollingHashArray(toks), 60)))
    assert(kern == hof)
  }

  test("identical texts collide on every detector's key") {
    val df = Seq("spark engine test", "spark engine test").toDF("t")
    val sigs = df.select(
      K.minhashSig(K.shingleHashSet(col("t"), 5), 32).as("sig"),
      K.simhash32(K.rollingHashArray(
        graft.functions.TextFunctions.tokens(col("t")))).as("sh")).collect()
    assert(sigs(0) == sigs(1))
  }

  test("lshBands kernel == HOF band fold") {
    val df = texts.toDF("t")
    val sig = K.minhashSig(K.shingleHashSet(col("t"), 3), 32)
    val kern = col1(df.select(K.lshBands(sig, 8, 4)))
    val hof = col1(df.select(H.lshBandHashes(sig, 8, 4)))
    assert(kern == hof)
  }

  test("planeProject kernel: LCG plane dots match a direct scala fold") {
    val v = Array(0.3, -0.7, 0.64, 0.1)
    val df = Seq(Tuple1(v.toSeq)).toDF("v")
    val got = col1(df.select(K.planeProject(col("v"), 5, 1000)))
      .head.asInstanceOf[scala.collection.Seq[Double]].toList
    val P = 1000000007L
    val want = (0 until 5).map { o =>
      val p = 1000 + o
      v.zipWithIndex.map { case (x, d) =>
        var h = (48271L * (p * 131L + d + 1) + 524287L) % P
        h = (48271L * h + 524287L) % P
        h = (48271L * h + 524287L) % P
        x * (h.toDouble - 500000003.0)
      }.foldLeft(0.0)(_ + _)
    }.toList
    assert(got == want)
    // plane indices sit above every band sketch's (seed offset >= 1000)
    assert(got.forall(x => !x.isNaN))
  }

  test("windowHashSet over token hashes: distinct n-gram keys") {
    val df = Seq("a b c a b c", "a b c", "a b").toDF("t")
    val toks = graft.functions.TextFunctions.tokens(col("t"), 1, 100)
    val r = col1(df.select(K.windowHashSet(K.rollingHashArray(toks), 3)))
      .map(_.asInstanceOf[scala.collection.Seq[Long]].toList)
    assert(r(0).length == 3) // abc, bca, cab, abc(dup) -> 3 distinct windows
    assert(r(1).length == 1)
    assert(r(2).isEmpty)
    assert(r(1).toSet.subsetOf(r(0).toSet))
  }

  test("dotK and unitVector kernels == HOF vector math") {
    val vs = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(0.0, 0.0)),
      (Seq(-1.5, 2.5), Seq(3.5, -4.5)))
    val df = vs.toDF("a", "b")
    val kern = df.select(K.dotK(col("a"), col("b"))).collect().map(_.getDouble(0))
    val hof = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(kern.toSeq == hof.toSeq)
    val unit = df.select(K.unitVector(col("a")).as("u"))
      .select(K.dotK(col("u"), col("u"))).collect().map(_.getDouble(0))
    assert(math.abs(unit(0) - 1.0) < 1e-12)
    assert(unit(1) == 0.0) // zero vector stays zero
  }

  test("property: jaccard stays in [0,1] and is symmetric (seeded cases)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(20)((
      Seq.fill(rnd.nextInt(8))(rnd.nextInt(10).toLong),
      Seq.fill(rnd.nextInt(8))(rnd.nextInt(10).toLong)))
    val rows = cases.toDF("a", "b").select(
      VectorFunctions.jaccard(col("a"), col("b")),
      VectorFunctions.jaccard(col("b"), col("a"))).collect()
    rows.foreach { r =>
      val (j1, j2) = (r.getDouble(0), r.getDouble(1))
      assert(j1 >= 0.0 && j1 <= 1.0 && j1 == j2)
    }
  }

  test("property: minhash signature similarity approximates jaccard for equal sets") {
    val df = Seq(("identical shingle text content here", "identical shingle text content here"))
      .toDF("a", "b")
    val r = df.select(H.signatureSimilarity(
      K.minhashSig(K.shingleHashSet(col("a"), 5), 32),
      K.minhashSig(K.shingleHashSet(col("b"), 5), 32))).collect()(0).getDouble(0)
    assert(r == 1.0)
  }

  test("planeBands is deterministic, band values within `bits`, bands distinct") {
    val r = col1(Seq(Seq.tabulate(64)(i => math.sin(i + 1)), Seq.tabulate(64)(i => math.sin(i + 1)))
      .toDF("v").select(K.planeBands(col("v"), 16, 12)))
      .map(_.asInstanceOf[scala.collection.Seq[Long]])
    assert(r(0) == r(1))
    assert(r(0).length == 16)
    assert(r(0).forall(b => b >= 0L && b < (1L << 12)))
    // the 3-round LCG must decorrelate bands: a degenerate (affine) plane
    // family packs every band with near-identical monotone bit runs
    assert(r(0).distinct.length > 8, s"bands look degenerate: ${r(0)}")
  }

  test("planeBands sign bits flip with the vector") {
    val v = Seq.tabulate(64)(i => math.cos(i * 1.7))
    val r = col1(Seq(v, v.map(-_)).toDF("v").select(K.planeBands(col("v"), 4, 10)))
      .map(_.asInstanceOf[scala.collection.Seq[Long]])
    // sign(−v · p) = −sign(v · p): negating the vector complements every band
    r(0).zip(r(1)).foreach { case (a, b) => assert((a ^ b) == (1L << 10) - 1) }
  }

  test("codepoints agree with the kernel on supplementary-plane chars; normalized() strips them anyway") {
    // U+1D54A (𝕊): Spark 4's split("")+ascii yields the true code point
    // (120138), matching HashKernels' codePoints and DuckDB's unicode() —
    // no surrogate split, so the hashes stay cross-engine-exact beyond BMP.
    val sup = "𝕊"
    val df = Seq(sup).toDF("t")
    val hof = col1(df.select(H.codepoints(col("t"))))
      .head.asInstanceOf[scala.collection.Seq[Long]]
    assert(hof == Seq(0x1d54aL), "HOF yields the true code point")
    assert(col1(df.select(H.rollingHash(col("t"))))
      == col1(df.select(K.rollingHash(col("t")))),
      "HOF and kernel rolling hashes agree beyond BMP")
    // and the pipeline never even sees such chars: every hashing call site
    // feeds normalized() output, whose [a-z0-9가-힣] class drops them
    val norm = col1(df.select(
      graft.functions.TextFunctions.normalized(col("t"))))
      .head.asInstanceOf[String]
    assert(norm.isEmpty, "normalized() strips supplementary-plane input")
  }
}
