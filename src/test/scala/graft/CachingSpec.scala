package graft

import org.apache.spark.sql.functions._

/** The persist-registry contract the harnesses rely on: caches tracked
  * inside a `scoped` block are gone when the block exits (no storage growth
  * across a Bench/Verify query loop), and a scope cannot release another
  * scope's frames.
  */
class CachingSpec extends SparkSuite {

  // assertions are per-frame (storageLevel), never global persisted-RDD
  // counts — other suites persist concurrently in the shared session

  test("scoped releases its tracked frames on exit") {
    import spark.implicits._
    var df: org.apache.spark.sql.DataFrame = null
    Caching.scoped {
      df = Caching.track(Seq(1, 2, 3).toDF("x").filter(col("x") > 1))
      assert(df.count() === 2)
      assert(Caching.trackedCount === 1)
      assert(df.storageLevel.useMemory)
    }
    assert(!df.storageLevel.useMemory, "scope exit must unpersist")
  }

  test("query loop does not accumulate cached partitions (Bench/Verify shape)") {
    import spark.implicits._
    val frames = (1 to 5).map { i =>
      val df = Caching.scoped {
        val d = Caching.track(Seq(i, i + 1).toDF("x"))
        d.count()
        d
      }
      Caching.releaseAll()
      df
    }
    assert(frames.forall(!_.storageLevel.useMemory))
  }

  test("an inner scope does not release the outer scope's frames") {
    import spark.implicits._
    Caching.scoped {
      val outer = Caching.track(Seq(1).toDF("x"))
      outer.count()
      Caching.scoped {
        Caching.track(Seq(2).toDF("y")).count()
      }
      assert(outer.storageLevel.useMemory, "outer frame must survive inner release")
    }
  }

  test("registerRdd frees a bare persisted RDD on scope exit") {
    import spark.implicits._
    val rdd = Seq(1, 2, 3).toDF("x").rdd
    rdd.persist()
    rdd.count()
    Caching.scoped {
      Caching.registerRdd(rdd)
      assert(rdd.getStorageLevel.useMemory)
    }
    assert(!rdd.getStorageLevel.useMemory, "scope exit must unpersist the RDD")
  }

  test("releaseAll drains only the global fallback scope") {
    import spark.implicits._
    Caching.scoped {
      val scopedDf = Caching.track(Seq(1).toDF("x"))
      scopedDf.count()
      Caching.releaseAll() // global scope is empty; scoped frame untouched
      assert(scopedDf.storageLevel.useMemory)
    }
  }

  test("registryGet: bounded per-map — past RegistryMaxEntries the oldest " +
    "entry is evicted and its frame unpersisted") {
    import spark.implicits._
    val reg = scala.collection.concurrent.TrieMap
      .empty[String, org.apache.spark.sql.DataFrame]
    def build(i: Int) = {
      val df = Seq(i.toLong).toDF("v").persist()
      df.count()
      df
    }
    val frames = (0 to Caching.RegistryMaxEntries).map { i =>
      i -> Caching.registryGet(reg, s"corpus$i")(build(i))
    }.toMap
    // one over the cap: corpus0 (oldest) must be gone and unpersisted
    assert(reg.size === Caching.RegistryMaxEntries)
    assert(!reg.contains("corpus0"))
    assert(frames(0).storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE)
    // the survivors stay cached and hit without rebuilding
    assert(frames(Caching.RegistryMaxEntries).storageLevel.useMemory)
    var rebuilt = false
    val hit = Caching.registryGet(reg, "corpus1") { rebuilt = true; build(1) }
    assert(!rebuilt && (hit eq frames(1)))
    // a key rebuilt after an explicit clear re-enters at the queue TAIL:
    // filling the map again must evict older survivors first, not it
    reg.clear()
    val again = Caching.registryGet(reg, "corpus1")(build(1))
    (100 until 100 + Caching.RegistryMaxEntries - 1).foreach { i =>
      Caching.registryGet(reg, s"corpus$i")(build(i))
    }
    assert(reg.contains("corpus1"))
    Caching.registryGet(reg, "one-more")(build(999))
    assert(!reg.contains("corpus1")) // now it IS the oldest
    assert(again.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    reg.values.foreach(_.unpersist(false))
    reg.clear()
  }
}
