package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embedders, PrecomputedEmbedder, Word2VecEmbedder}

/** The Embedder seam: both implementations produce the same (id, embedding)
  * contract and feed the similarity stack unchanged.
  */
class EmbeddersSpec extends SparkSuite {
  private val dir = SparkSpec.FixtureDir

  test("precomputed embedder joins vectors by id, casts to double") {
    val out = new PrecomputedEmbedder(
      Tables.embeddings(spark, dir), "vec_id", "embedding")
      .embed(Tables.documents(spark, dir).filter(col("doc_id") < 10),
        "doc_id", "text")
      .collect()
    assert(out.length == 10)
    assert(out.forall(_.getSeq[Double](1).length == 64))
  }

  test("word2vec embedder is seeded-deterministic and dimension-correct") {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 50)
    val e = new Word2VecEmbedder(dim = 16, maxIter = 2)
    val a = e.embed(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = e.embed(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet.nonEmpty && a.forall(_._2.length == 16))
    assert(a == b)
  }

  test("word2vec neighbors query: ranked, self-free") {
    val rows = Embedders.word2vecNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 != r._3 && r._2 >= 1 && r._2 <= 5))
  }

  test("embedder comparison profiles both implementations") {
    val rows = Embedders.embedderComparison(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("precomputed", "word2vec"))
    assert(rows("precomputed") == 100)
  }
}
