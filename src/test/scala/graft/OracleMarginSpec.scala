package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions.{dotK, unitVector}
import graft.functions.VectorFunctions.asDouble
import graft.operators.TopicModelOps

/** Float-boundary margins for the artifact-oracle queries that re-derive
  * averages in DuckDB with its own summation order (cluster_noise's
  * mean+2σ relabel; topic_examples_embed's centroid ranking). The oracle
  * compares exact hashes, so a point sitting within ulp distance of a
  * decision boundary could flip intermittently; this spec proves the
  * fixtures keep every decision ≥ 1e-9 away from its boundary — six-plus
  * orders beyond the ~1e-13 cross-engine summation wobble.
  */
class OracleMarginSpec extends SparkSuite {

  private val Eps = 1e-9

  private def noiseMargin(dir: String): Double = {
    // the exact chain of clusterEmbeddingsWithNoise up to the d/thr compare
    val assigned = TopicModelOps.clusterEmbeddings(
      Tables.embeddings(spark, dir), k = 8)
      .withColumn("p", org.apache.spark.ml.functions.vector_to_array(col("pca")))
      .select("vec_id", "cluster", "p")
      .persist()
    val cents = assigned
      .select(col("cluster"), posexplode(col("p")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(avg("x").as("m"))
      .groupBy("cluster")
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("centroid"))
    val withDist = assigned.join(broadcast(cents), "cluster")
      .withColumn("d", expr(
        "sqrt(aggregate(zip_with(p, centroid, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x))"))
    val thr = withDist.groupBy("cluster")
      .agg((avg("d") + stddev_pop(col("d")) * 2.0).as("thr"))
    val m = withDist.join(broadcast(thr), "cluster")
      .agg(min(abs(col("d") - col("thr")) / col("thr")))
      .collect()(0).getDouble(0)
    assigned.unpersist(false)
    m
  }

  test("cluster_noise: every distance sits far from its mean+2σ threshold") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val m = noiseMargin(dir)
      info(s"$dir min relative |d - thr| margin = $m")
      assert(m > Eps, s"$dir: a point sits within $m of the noise boundary")
    }
  }

  private def rankedScores(dir: String): DataFrame = {
    val assigned = TopicModelOps.clusterEmbeddings(
      Tables.embeddings(spark, dir), k = 8)
      .select(col("vec_id"), col("cluster"),
        unitVector(asDouble(col("embedding"))).as("nv"))
    val centroids = assigned.groupBy(col("cluster"))
      .agg(collect_list(col("nv")).as("vs"))
      .select(col("cluster"), expr(
        "transform(sequence(0, size(vs[0]) - 1), " +
          "i -> aggregate(vs, 0D, (acc, v) -> acc + v[i]) / size(vs))").as("centroid"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score01").desc, col("vec_id"))
    assigned.join(broadcast(centroids), "cluster")
      .withColumn("score01",
        (dotK(col("nv"), unitVector(col("centroid"))) + 1.0) / 2.0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
  }

  test("topic_examples_embed: adjacent ranked scores are exact ties or ≥ 1e-9 apart") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val rows = rankedScores(dir)
        .select("cluster", "rank", "score01")
        .collect()
        .groupBy(_.getInt(0))
      val gaps = rows.values.flatMap { rs =>
        val s = rs.sortBy(_.getInt(1)).map(_.getDouble(2))
        s.zip(s.drop(1)).map { case (a, b) => a - b }
      }
      val nearTies = gaps.filter(g => g != 0.0 && g < Eps)
      info(s"$dir min nonzero rank gap = ${gaps.filter(_ != 0.0).minOption.getOrElse(-1.0)}")
      assert(nearTies.isEmpty, s"$dir: near-tie gaps $nearTies")
      // the 4-decimal rounding both engines apply must not straddle a
      // half-way point either
      val roundRisk = rows.values.flatten
        .map(r => math.abs((r.getDouble(2) * 10000) % 1.0 - 0.5))
        .filter(_ < Eps)
      assert(roundRisk.isEmpty, s"$dir: scores at a rounding boundary")
    }
  }
}
