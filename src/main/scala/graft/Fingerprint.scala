package graft

import org.apache.spark.sql.SparkSession

/** Content key for the deterministic-fit registries (TopicModelOps, PqOps,
  * VocabOps, ClassifierOps, DedupOps label cache): `dir` alone is not a
  * safe cache key — a corpus overwritten in place mid-session would serve
  * stale fits. `dirKey` appends a seed-7 base-31 rolling hash over the
  * sorted (path, length, modificationTime) file listing of the directory:
  * ONE driver-side FS metadata listing per call, no data read — the same
  * trade every build system makes (a byte-identical rewrite that preserves
  * size+mtime would false-hit, which is harmless for caches whose values
  * are deterministic functions of the content; any real rewrite changes
  * mtime and invalidates). An unchanged corpus still hits across queries,
  * which is the whole point of the registries.
  */
object Fingerprint {

  private val P = 1000000007L

  /** `dir@<listing-hash>` — the registry key for a corpus directory. */
  def dirKey(spark: SparkSession, dir: String): String =
    s"$dir@${listingHash(spark, dir)}"

  /** Rolling hash of the recursive (path, len, mtime) listing, sorted by
    * path so FS enumeration order cannot leak into the key.
    */
  def listingHash(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    if (fs.exists(path)) {
      val it = fs.listFiles(path, true)
      while (it.hasNext) {
        val st = it.next()
        entries += ((st.getPath.toString, st.getLen, st.getModificationTime))
      }
    }
    var acc = 7L
    entries.sortBy(_._1).foreach { case (p, len, mtime) =>
      var i = 0
      while (i < p.length) { acc = (acc * 31 + p.charAt(i)) % P; i += 1 }
      acc = (acc * 31 + (len % P)) % P
      acc = (acc * 31 + (mtime % P)) % P
    }
    acc
  }
}
