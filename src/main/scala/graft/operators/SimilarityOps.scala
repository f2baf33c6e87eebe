package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.asDouble
import graft.functions.HashExpressions._

/** Approximate-nearest-neighbor similarity search over an embedding column —
  * the generalization of the reference's "rank documents by similarity to a
  * topic centroid" surface (/root/reference/BERTopic_Analysis.py:574-617,
  * SURVEY.md §2.9 M14).
  *
  * Two tiers:
  *   - bruteForceTopK: exact top-k cosine. The query side is tiny and
  *     broadcast; the corpus streams through one codegen'd dot product per
  *     (query, vector) pair. O(|Q|·n) — the correctness baseline, and the
  *     right plan whenever |Q| is small (centroid scoring, eval probes).
  *   - lshTopK: random-hyperplane LSH sketches, banded for recall; only
  *     bucket-mates are scored. At 100 TB the sketch+band columns become a
  *     pre-materialized index table and the bucket join is the only shuffle —
  *     candidate sets stay ~constant per query as the corpus grows.
  *
  * All arithmetic (unit vectors, ordered-fold dots, LCG hyperplanes) is
  * bit-reproducible in the DuckDB oracle.
  */
object SimilarityOps {

  val SketchBits = 16
  val SketchBands = 4 // 4 bands × 4 bits

  /** Corpus with unit vectors (norm computed once per row). */
  private def unitCorpus(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), unitVector(asDouble(col("embedding"))).as("nv"),
      col("label"))

  /** Exact cosine top-k for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = queries.select(col("vec_id").as("query_id"), col("nv").as("qv"))
      .join(corpus.select(col("vec_id"), col("nv")),
        col("query_id") =!= col("vec_id"))
      .withColumn("cos", dotK(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Query: exact top-10 neighbors for the first 5 vectors. */
  def bruteTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.Caching.track(unitCorpus(Tables.embeddings(spark, dir)))
    bruteForceTopK(corpus, corpus.filter(col("vec_id") < 5), 10)
  }

  /** Sketch + band columns for the LSH index. 4-bit band values are kept
    * scaled by 2^(4j) (equality-preserving, no division).
    */
  def withSketch(corpus: DataFrame): DataFrame = {
    val bandExprs = transform(sequence(lit(0), lit(SketchBands - 1)), j => {
      val lo = pow(lit(2.0), j * 4).cast("long")
      val hi = pow(lit(2.0), j * 4 + 4).cast("long")
      (col("sketch") % hi) - (col("sketch") % lo)
    })
    corpus
      .withColumn("sketch", lshSketch(col("nv"), SketchBits))
      .withColumn("bands", bandExprs)
  }

  /** LSH-bucketed approximate top-k: candidates share ≥1 of 4 sketch bands
    * with the query; exact cosine re-rank on the (small) candidate set.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cbuckets = corpus.select(col("vec_id"), col("nv"),
      posexplode(col("bands")).as(Seq("band", "band_val")))
    val qbuckets = queries.select(col("vec_id").as("query_id"), col("nv").as("qv"),
      posexplode(col("bands")).as(Seq("band", "band_val")))
    // distinct over ids only — deduping rows that carry the 64-dim vectors
    // would hash the arrays themselves; vectors re-attach after the dedup
    val cands = qbuckets.select(col("query_id"), col("band"), col("band_val"))
      .join(cbuckets.select(col("vec_id"), col("band"), col("band_val")),
        Seq("band", "band_val"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands
      .join(queries.select(col("vec_id").as("query_id"), col("nv").as("qv")),
        "query_id")
      .join(corpus.select(col("vec_id"), col("nv")), "vec_id")
      .withColumn("cos", dotK(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Query: LSH ANN top-3 for the first 50 vectors. */
  def lshAnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.Caching.track(
      withSketch(unitCorpus(Tables.embeddings(spark, dir))))
    lshTopK(corpus, corpus.filter(col("vec_id") < 50), 3)
  }

  /** Query: recall@10 of the LSH-ANN tier against the exact brute-force
    * answer on the probe query set — the quality gauge an ANN deployment
    * ships alongside its index parameters (bands/bits here; nprobe/nlists
    * for the IVF tier). Both sides are deterministic, so the recall itself
    * sits under the exact oracle.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.Caching.track(
      withSketch(unitCorpus(Tables.embeddings(spark, dir))))
    val queries = corpus.filter(col("vec_id") < 5)
    val brute = bruteForceTopK(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"))
    val ann = lshTopK(corpus, queries, 10)
      .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
    brute.join(ann, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_brute"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .withColumn("recall", round(col("n_hits") / col("n_brute"), 4))
  }

  /** IVF (inverted-file) index: a seeded KMeans coarse quantizer assigns
    * every corpus vector to its nearest centroid's list; queries probe the
    * `nProbe` nearest lists and re-rank exactly. The second ANN tier next to
    * lshTopK: at 100 TB the lists are a bucketed/partitioned table keyed by
    * list id, the centroid table is a broadcast of `nLists` rows, and each
    * query scans ~n·nProbe/nLists vectors instead of n.
    * Returns (indexed corpus with `list`, centroid table (list, centroid)).
    */
  def ivfIndex(corpus: DataFrame, nLists: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = corpus.withColumn("v", array_to_vector(col("nv")))
    val km = new KMeans().setK(nLists).setSeed(TopicModelOps.Seed)
      .setFeaturesCol("v").setPredictionCol("list").fit(vecs)
    val indexed = km.transform(vecs).drop("v")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("list", "centroid")
    (indexed, cents)
  }

  /** IVF-probed approximate top-k: each query scores only the vectors in its
    * `nProbe` nearest lists (by centroid dot product on unit vectors), then
    * exact cosine re-rank — identical output shape to lshTopK/bruteForceTopK.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val (indexed, cents) = ivfIndex(corpus, nLists)
    ivfProbe(indexed, cents, queries, k, nProbe)
  }

  /** The relational half of the IVF search (everything downstream of the
    * quantizer fit): probe the `nProbe` nearest lists, exact re-rank inside
    * them. Split out so the oracle can verify it from the persisted index.
    */
  def ivfProbe(indexed: DataFrame, cents: DataFrame, queries: DataFrame,
               k: Int, nProbe: Int): DataFrame = {
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdot").desc, col("list"))
    val probed = queries.select(col("vec_id").as("query_id"), col("nv").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cdot", dotK(col("qv"), col("centroid")))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("qv"), col("list"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    probed
      .join(indexed.select(col("vec_id"), col("nv"), col("list")), "list")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dotK(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Query: IVF ANN top-3 for the first 50 vectors. The quantizer fit stays
    * rows-only territory, but its artifacts (centroid table + list
    * assignments) export for the oracle, which re-runs the probe ranking and
    * the in-list exact re-rank bit-identically (unit vectors and ordered-fold
    * dots are exact in DuckDB; BruteVsIvfSpec pins recall on top).
    */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.Caching.track(unitCorpus(Tables.embeddings(spark, dir)))
    val (indexed, cents) = ivfIndex(corpus, nLists = 16)
    graft.Artifacts.save("ivf_assign")(indexed.select("vec_id", "list"))
    graft.Artifacts.save("ivf_centroids")(cents)
    ivfProbe(indexed, cents, corpus.filter(col("vec_id") < 50), k = 3, nProbe = 4)
  }

  /** LSH-bucketed near-duplicate pairs: candidates share ≥1 sketch band,
    * survivors keep exact cosine ≥ minCosine. The scale path for embedding
    * dedup (DedupOps.embeddingDupPairs is the quadratic verification
    * baseline): the only shuffle is the (band, band_val) self-equi-join on
    * fixed-width keys, so candidate volume tracks bucket occupancy — not n² —
    * and at 100 TB the sketch+band columns are a pre-materialized index.
    * `corpus` needs (vec_id, nv, label, bands) — see withSketch.
    */
  def lshCosinePairs(corpus: DataFrame, minCosine: Double): DataFrame = {
    val buckets = corpus.select(col("vec_id"),
      posexplode(col("bands")).as(Seq("band", "band_val")))
    // dedup candidate ids before re-attaching vectors (hashing 64-dim arrays
    // through the distinct would dominate the exchange)
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cands
      .join(corpus.select(col("vec_id").as("vec_a"), col("nv").as("nv_a"),
        col("label").as("label_a")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("nv").as("nv_b"),
        col("label").as("label_b")), "vec_b")
      .withColumn("cos", dotK(col("nv_a"), col("nv_b")))
      .filter(col("cos") >= minCosine)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"),
        (col("label_a") === col("label_b")).cast("int").as("same_label"))
  }

  /** Query: LSH-bucketed embedding near-dup pairs (threshold matches
    * dedup_embed_cosine so the two views are directly comparable; the LSH
    * view trades recall on sub-band-collision pairs for linear scaling).
    */
  def lshDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.Caching.track(
      withSketch(unitCorpus(Tables.embeddings(spark, dir))))
    lshCosinePairs(corpus, minCosine = 0.4)
  }

  /** Query: embedding near-dup CLUSTERS — the dedup-ACTION view of the LSH
    * pair path, completing the cluster trio next to minhash/simhash:
    * cosine-verified pairs (≥ the dedup_embed_lsh threshold) are the edges,
    * min-label propagation collapses chains, clusters with > 1 member
    * report size and representative. Linear output at any duplicate
    * multiplicity.
    */
  def lshDupClusterProfile(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.Caching.track(
      withSketch(unitCorpus(Tables.embeddings(spark, dir))))
    val edges = graft.Caching.track(
      lshCosinePairs(corpus, minCosine = 0.4).select("vec_a", "vec_b"))
    val buckets = edges
      .select(col("vec_a").as("doc_id"),
        col("vec_a").as("band"), col("vec_b").as("band_hash"))
      .union(edges.select(col("vec_b").as("doc_id"),
        col("vec_a").as("band"), col("vec_b").as("band_hash")))
    DedupOps.propagateLabels(buckets, rounds = 3)
      .groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_vecs"), max(col("doc_id")).as("max_vec_id"))
      .filter(col("n_vecs") > 1)
  }
}
