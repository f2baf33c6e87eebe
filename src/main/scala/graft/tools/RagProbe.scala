package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the RAG grounding score distributions — self-probe
  * (rag_chunk_topk) vs held-out-probe (rag_chunk_heldout) — on the base
  * fixtures AND their realistic twins. The committed DEPLOY evidence for
  * VERDICT r17 #4: self-retrieval's cosine inflation is a property of
  * corpora whose documents have DISTINCTIVE vocabulary (the twin's
  * unique mass), not of the base fixture's shared 31-word space, and the
  * held-out face is the leakage-safe gauge either way.
  *
  *   MAIN=graft.tools.RagProbe tools/run_verify.sh /root/testdata/sf0.01
  */
object RagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft._
    val dirs = if (args.nonEmpty) args.filter(_.startsWith("/root/testdata")).toSeq
      else Seq("/root/testdata/sf0.01")
    def stats(df: org.apache.spark.sql.DataFrame): String = {
      val rows = df.collect()
      val t1 = rows.filter(_.getInt(1) == 1).map(_.getDouble(5))
      val all = rows.map(_.getDouble(5))
      f"top1 mean=${t1.sum / t1.length}%.3f min=${t1.min}%.3f " +
        f"max=${t1.max}%.3f | all mean=${all.sum / all.length}%.3f " +
        f"(${t1.length} probes)"
    }
    dirs.foreach { dir =>
      Caching.scoped {
        println(s"[rag] $dir base self:    " +
          stats(operators.RetrievalOps.ragChunkTopK(spark, dir)))
        println(s"[rag] $dir base heldout: " +
          stats(operators.RetrievalOps.ragChunkHeldout(spark, dir)))
      }
      Caching.releaseAll()
      operators.RetrievalOps.clearRagCache()
      Artifacts.namespaced("real") {
        val twin = RealisticCorpus.ensure(spark, dir)
        Caching.scoped {
          println(s"[rag] $dir twin self:    " +
            stats(operators.RetrievalOps.ragChunkTopK(spark, twin)))
          println(s"[rag] $dir twin heldout: " +
            stats(operators.RetrievalOps.ragChunkHeldout(spark, twin)))
        }
      }
      Caching.releaseAll()
      operators.RetrievalOps.clearRagCache()
    }
    spark.stop()
  }
}
