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
}
