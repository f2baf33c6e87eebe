package graft

import graft.operators.DedupOps

/** Behavioral tests for the near-dup detectors on a tiny corpus with known
  * duplicate structure.
  */
class DedupOpsSpec extends SparkSuite {
  import spark.implicits._

  // docs 1/2 identical; 3 is a near-dup of 1 (one word changed);
  // 4 is unrelated; 5 shares nothing.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the sleepy dog again and again"),
    (4L, "completely different content about spark query engines at scale"),
    (5L, "무관한 한국어 문서 내용 전혀 다른 주제")
  ).toDF("doc_id", "text")

  test("minhashPairs finds the identical pair with est=jaccard=1") {
    val pairs = DedupOps.minhashPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.isDefined && exact.get._3 == 1.0 && exact.get._4 == 1.0)
    // near-dup 1-3 surfaces with high but sub-1 similarity
    val near = pairs.filter(p => Set(p._1, p._2).subsetOf(Set(1L, 2L, 3L)) && p._2 == 3L)
    assert(near.nonEmpty && near.forall(p => p._4 > 0.5 && p._4 < 1.0))
    // unrelated docs never pair
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
  }

  test("simhashPairs: identical docs at hamming 0, near-dups within 3 bits") {
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("ngramJaccardPairs: identical pair at jaccard 1, blocking keeps unrelated apart") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 20, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embeddingDupPairs finds exact-duplicate vectors and respects threshold") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.9f, 0.1f, 0.0f), 0),
      (4L, Array(0.0f, 1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val pairs = DedupOps.embeddingDupPairs(embs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0 && p._4 == 1))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L)) // cos ≈ 0.994
    assert(!pairs.exists(p => p._2 == 4L)) // orthogonal
  }

  test("minhashClusters groups transitively-linked near-dups under one label") {
    val clusters = DedupOps.minhashClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1, 2, 3 are one near-dup family; 4 and 5 are singletons
    assert(clusters(1L) == clusters(2L) && clusters(2L) == clusters(3L))
    assert(clusters(1L) == 1L) // representative = min id
    assert(clusters(4L) == 4L && clusters(5L) == 5L)
  }

  test("simhashClusters links only hamming-verified pairs, keeps unrelated docs apart") {
    val clusters = DedupOps.simhashClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the identical pair must share a label with representative = min id;
    // the unrelated docs must NOT merge (the raw-byte-band formulation
    // collapsed everything into one cluster at corpus scale — regression)
    assert(clusters(1L) == 1L && clusters(2L) == 1L)
    assert(clusters(4L) == 4L && clusters(5L) == 5L)
    assert(clusters.size == 5) // every fingerprinted doc keeps a label
  }

  test("propagateLabelsTracked: early-stops at the fixed point and reports rounds used") {
    // two disjoint pairs: one merging round, then a round that changes
    // nothing -> converged at 2 of the 3 allowed rounds
    val pairBuckets = Seq(
      (1L, 100L, 100L), (2L, 100L, 100L),
      (7L, 200L, 200L), (8L, 200L, 200L)
    ).toDF("doc_id", "band", "band_hash")
    val p = DedupOps.propagateLabelsTracked(pairBuckets, maxRounds = 3)
    assert(p.converged && p.roundsUsed == 2)
    val labels = p.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(2L) == 1L && labels(8L) == 7L)
  }

  test("propagateLabelsTracked: a chain longer than the bound reports non-convergence") {
    // path 1-2-…-40 as pair-edge buckets: even with pointer jumping the
    // min label covers only ~2^(rounds+1) hops, so a 2-round bound is hit
    // with labels still moving -- the under-merge is OBSERVABLE, not silent
    val chain = (1L until 40L).flatMap { a =>
      Seq((a, a, a + 1), (a + 1, a, a + 1))
    }.toDF("doc_id", "band", "band_hash")
    val p = DedupOps.propagateLabelsTracked(chain, maxRounds = 2)
    assert(!p.converged && p.roundsUsed == 2)
    val labels = p.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L)
    assert(labels.values.toSet.size > 1, "bounded rounds under-merge the chain")
    // with a bound that covers the chain's depth it converges fully
    val full = DedupOps.propagateLabelsTracked(chain, maxRounds = 12)
    assert(full.converged && full.roundsUsed <= 12)
    val fl = full.labels.collect().map(r => r.getLong(1)).toSet
    assert(fl == Set(1L))
  }

  test("shipped cluster queries reach their fixed point inside ClusterRounds (sf0.01)") {
    // the cluster queries run with maxRounds = ClusterRounds; this pins
    // that the bound is NOT binding at the correctness-gate scale — the
    // early-stop fires with rounds to spare, so the oracle's full unroll
    // and the true single-linkage fixed point coincide. (The deepest
    // measured case overall is the sf0.1 simhash chain at 9 jump-rounds —
    // 10 before the r9 round-0 contraction; the original 3-round
    // hop-per-round bound silently under-merged, which this spec would now
    // catch.)
    val dir = "/root/testdata/sf0.01"
    val fdocs = Tables.documents(spark, dir)
    val buckets = DedupOps.minhashSignatures(fdocs, "text")
      .select(functionsCol("doc_id"),
        org.apache.spark.sql.functions.posexplode(functionsCol("bands"))
          .as(Seq("band", "band_hash")))
    val p = DedupOps.propagateLabelsTracked(buckets, DedupOps.ClusterRounds)
    info(s"minhash buckets: converged=${p.converged} roundsUsed=${p.roundsUsed}")
    assert(p.converged && p.roundsUsed < DedupOps.ClusterRounds)
    graft.Caching.releaseAll()
    val sedges = DedupOps.simhashPairs(fdocs, "doc_id", "text", 3)
      .select(functionsCol("doc_a"), functionsCol("doc_b"))
    val sp = DedupOps.propagateEdgesTracked(sedges, DedupOps.ClusterRounds)
    info(s"simhash edges: converged=${sp.converged} roundsUsed=${sp.roundsUsed}")
    assert(sp.converged && sp.roundsUsed < DedupOps.ClusterRounds)
    graft.Caching.releaseAll()
    val eedges = operators.SimilarityOps.lshDupPairs(spark, dir)
      .select(functionsCol("vec_a").as("doc_a"), functionsCol("vec_b").as("doc_b"))
    val ep = DedupOps.propagateEdgesTracked(eedges, DedupOps.ClusterRounds)
    info(s"embed edges: converged=${ep.converged} roundsUsed=${ep.roundsUsed}")
    assert(ep.converged && ep.roundsUsed < DedupOps.ClusterRounds)
    graft.Caching.releaseAll()
  }

  test("propagateEdgesTracked == bucket formulation round-for-round on pair graphs") {
    // the edge-specialized step must be label-identical to the generic
    // bucket formulation at EVERY round bound (not just the fixed point) —
    // that identity is what lets the oracle's bucket-CTE unroll verify the
    // edge path unchanged. Probe a deep chain (jump behavior) plus a
    // star + triangle (merge behavior), at a binding and a non-binding
    // bound.
    val edges = ((1L until 30L).map(a => (a, a + 1)) ++ // 30-deep chain
      Seq((50L, 60L), (50L, 70L), (50L, 80L), // star
        (90L, 91L), (91L, 92L), (90L, 92L)) // triangle
      ).toDF("doc_a", "doc_b")
    val asBuckets = edges
      .select(functionsCol("doc_a").as("doc_id"),
        functionsCol("doc_a").as("band"), functionsCol("doc_b").as("band_hash"))
      .union(edges.select(functionsCol("doc_b").as("doc_id"),
        functionsCol("doc_a").as("band"), functionsCol("doc_b").as("band_hash")))
    for (bound <- Seq(2, 12)) {
      val viaEdges = DedupOps.propagateEdgesTracked(edges, bound)
      val viaBuckets = DedupOps.propagateLabelsTracked(asBuckets, bound)
      assert(viaEdges.roundsUsed == viaBuckets.roundsUsed, s"bound=$bound")
      assert(viaEdges.converged == viaBuckets.converged, s"bound=$bound")
      val le = viaEdges.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lb = viaBuckets.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(le == lb, s"bound=$bound")
      graft.Caching.releaseAll()
    }
  }

  test("local propagation path == distributed path round-for-round") {
    // the small-graph local simulation (r15) must be indistinguishable
    // from the distributed round loop at EVERY bound — roundsUsed,
    // converged, and labels, including intentional under-merge at a
    // binding bound. localMaxRows = -1 forces the distributed path on the
    // same graph.
    val edges = ((1L until 30L).map(a => (a, a + 1)) ++
      Seq((50L, 60L), (50L, 70L), (50L, 80L),
        (90L, 91L), (91L, 92L), (90L, 92L))
      ).toDF("doc_a", "doc_b")
    val asBuckets = edges
      .select(functionsCol("doc_a").as("doc_id"),
        functionsCol("doc_a").as("band"), functionsCol("doc_b").as("band_hash"))
      .union(edges.select(functionsCol("doc_b").as("doc_id"),
        functionsCol("doc_a").as("band"), functionsCol("doc_b").as("band_hash")))
    for (bound <- Seq(2, 12)) {
      val localE = DedupOps.propagateEdgesTracked(edges, bound)
      val distE = DedupOps.propagateEdgesTracked(edges, bound, localMaxRows = -1L)
      assert(localE.roundsUsed == distE.roundsUsed, s"edges bound=$bound")
      assert(localE.converged == distE.converged, s"edges bound=$bound")
      assert(localE.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        distE.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        s"edges bound=$bound")
      graft.Caching.releaseAll()
      val localB = DedupOps.propagateLabelsTracked(asBuckets, bound)
      val distB = DedupOps.propagateLabelsTracked(asBuckets, bound, localMaxRows = -1L)
      assert(localB.roundsUsed == distB.roundsUsed, s"buckets bound=$bound")
      assert(localB.converged == distB.converged, s"buckets bound=$bound")
      assert(localB.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        distB.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        s"buckets bound=$bound")
      graft.Caching.releaseAll()
    }
  }

  test("hot-bucket cap bounds pair emission on a viral duplicate group") {
    // 10k byte-identical docs: every doc lands in the SAME bucket of every
    // band, so the uncapped faces would emit C(10000,2) ≈ 50M candidate
    // rows per band — the viral-boilerplate shape that makes the pair
    // QUERIES explode at 100 TB. With the cap the buckets truncate to
    // their `cap` lowest ids and output is exactly C(cap,2).
    val viral = spark.range(10000).select(
      functionsCol("id").as("doc_id"),
      org.apache.spark.sql.functions.lit(
        "the same viral boilerplate banner text repeated on every single page"
      ).as("text"))
    val cap = 32
    val expected = cap.toLong * (cap - 1) / 2
    val mh = DedupOps.minhashPairs(viral, "doc_id", "text", 0.5, maxBucket = cap)
    assert(mh.count() == expected)
    graft.Caching.releaseAll()
    val sh = DedupOps.simhashPairs(viral, "doc_id", "text", 3, maxBucket = cap)
    assert(sh.count() == expected)
    graft.Caching.releaseAll()
    // truncation is reported, not silent: every band's one hot bucket shows
    // its true size and the kept count
    val rep = DedupOps.bucketTruncationReport(viral, "doc_id", "text", cap)
      .collect()
    assert(rep.length == DedupOps.LshBands + 4) // minhash bands + simhash bands
    assert(rep.forall(r => r.getAs[Long]("n_docs") == 10000L &&
      r.getAs[Int]("kept") == cap))
    graft.Caching.releaseAll()
  }

  test("the shipped cap is not binding at fixture scale (report empty)") {
    // bit-equality of the capped and uncapped faces on the oracle board
    // follows from the cap never firing there: an empty truncation report
    // means the row_number filter keeps every bucket row
    val fdocs = Tables.documents(spark, "/root/testdata/sf0.01")
    val rep = DedupOps.bucketTruncationReport(fdocs, "doc_id", "text")
    assert(rep.count() == 0)
    graft.Caching.releaseAll()
  }

  test("contractionPays: skips on near-duplicate-free corpora, fires under multiplicity") {
    import org.apache.spark.sql.functions._
    // all-distinct keys: zero duplicate-pair mass -> the pre-pass is pure
    // overhead and the gate must skip it
    val distinctKeys = spark.range(10000)
      .select(col("id").as("doc_id"), col("id").as("simhash"))
    assert(!DedupOps.contractionPays(distinctKeys, "simhash"))
    // a handful of small duplicate classes (the sf0.1 fixture regime:
    // 8 duplicate texts in 5000 docs) still skips — the mass is trivial
    val fewDups = spark.range(5000)
      .select(col("id").as("doc_id"), (col("id") % 4992).as("simhash"))
    assert(!DedupOps.contractionPays(fewDups, "simhash"))
    // viral multiplicity: 100 copies of each of 500 keys -> C(100,2)·500
    // ≈ 2.5M duplicate pairs over 50k rows -> contraction pays
    val viral = spark.range(50000)
      .select(col("id").as("doc_id"), (col("id") % 500).as("simhash"))
    assert(DedupOps.contractionPays(viral, "simhash"))
  }

  test("cluster contraction preserves labels vs the uncontracted build (sf0.01)") {
    // simhashClusters/lshDupClusterProfile contract fp-equal / vector-equal
    // rows to one node before pairing (the viral-group guard on the CLUSTER
    // faces); this pins that the contracted graph propagates to the exact
    // labels of the plain verified-pair build on the real fixture corpus.
    // contract = Some(true) FORCES the pre-pass: the r11 cost gate
    // (contractionPays) would skip it on this near-duplicate-free fixture,
    // and this spec exists to pin the contracted machinery itself
    val dir = "/root/testdata/sf0.01"
    val fdocs = Tables.documents(spark, dir)
    val contracted = DedupOps.simhashClusters(fdocs, "doc_id", "text",
        contract = Some(true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.releaseAll()
    val edges = DedupOps.simhashPairs(fdocs, "doc_id", "text", 3)
      .select(functionsCol("doc_a"), functionsCol("doc_b"))
    val prop = DedupOps.propagateEdgesTracked(edges, DedupOps.ClusterRounds)
      .labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.releaseAll()
    val ids = fdocs.select("doc_id").collect().map(_.getLong(0))
      .filter(contracted.contains) // docs with no tokens drop in both builds
    val uncontracted = ids.map(id => id -> prop.getOrElse(id, id)).toMap
    assert(contracted == uncontracted)
  }

  test("embed cluster contraction matches the uncontracted profile (sf0.01)") {
    // forced contraction, same rationale as the simhash pin above
    val dir = "/root/testdata/sf0.01"
    val profile = operators.SimilarityOps.lshDupClusterProfile(spark, dir,
        contract = Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caching.releaseAll()
    val edges = operators.SimilarityOps.lshDupPairs(spark, dir)
      .select(functionsCol("vec_a").as("doc_a"), functionsCol("vec_b").as("doc_b"))
    val labels = DedupOps.propagateEdgesTracked(edges, DedupOps.ClusterRounds)
      .labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.releaseAll()
    val vecIds = Tables.embeddings(spark, dir).select("vec_id")
      .collect().map(_.getLong(0))
    val expected = vecIds.map(id => id -> labels.getOrElse(id, id))
      .groupBy(_._2).map { case (lab, members) =>
        (lab, members.length.toLong, members.map(_._1).max)
      }.filter(_._2 > 1).toSet
    assert(profile == expected)
  }

  test("keepBest keeps the max-score member, ties to the smallest id") {
    import spark.implicits._
    val labels = Seq( // two clusters + a singleton
      (1L, 1L), (2L, 1L), (3L, 1L), // cluster 1
      (4L, 4L), (5L, 4L), // cluster 4
      (6L, 6L)).toDF("doc_id", "label")
    val scored = Seq(
      1L -> 0.25, 2L -> 0.75, 3L -> 0.75, // tie at 0.75 → keep 2
      4L -> 0.5, 5L -> 1.0, // keep 5
      6L -> 0.0).toDF("doc_id", "q")
    val got = DedupOps.keepBest(labels, scored, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 0.75, 2L), (4L, 2L, 1.0, 5L), (6L, 1L, 0.0, 6L)))
  }

  test("keepBestProfile keeps exactly one doc per multi-member cluster") {
    val dir = "/root/testdata/sf0.001"
    val profile = DedupOps.keepBestProfile(spark, dir).collect()
    graft.Caching.releaseAll()
    val sizes = DedupOps.minhashClusterProfile(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.releaseAll()
    assert(profile.map(_.getLong(0)).toSet === sizes.keySet)
    profile.foreach { r =>
      assert(r.getLong(1) === sizes(r.getLong(0))) // n_docs agrees
      assert(r.getLong(4) === r.getLong(1) - 1) // n_removed = n_docs - 1
    }
  }

  test("dedup is idempotent: rerunning on deduped docs yields no pairs") {
    val pairs = DedupOps.minhashPairs(docs, "doc_id", "text", 0.5)
    val dupIds = pairs.select("doc_b").distinct()
      .collect().map(_.getLong(0)).toSet
    val deduped = docs.filter(!functionsCol("doc_id").isin(dupIds.toSeq: _*))
    val again = DedupOps.minhashPairs(deduped, "doc_id", "text", 0.9)
    assert(again.count() == 0)
  }

  private def functionsCol(name: String) = org.apache.spark.sql.functions.col(name)
}
