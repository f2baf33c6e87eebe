package graft

import org.apache.spark.sql.functions._

/** The persist-registry contract the harnesses rely on: caches tracked
  * inside a `scoped` block are gone when the block exits (no storage growth
  * across a Bench/Verify query loop), and a scope cannot release another
  * scope's frames.
  */
class CachingSpec extends SparkSuite {

  private def cachedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("scoped releases its tracked frames on exit") {
    import spark.implicits._
    val before = cachedCount
    Caching.scoped {
      val df = Caching.track(Seq(1, 2, 3).toDF("x").filter(col("x") > 1))
      assert(df.count() === 2)
      assert(Caching.trackedCount === 1)
    }
    // unpersist(false) is async on executors but synchronous in the
    // driver-side registry local[4] uses
    assert(cachedCount === before)
  }

  test("query loop does not accumulate cached partitions (Bench/Verify shape)") {
    import spark.implicits._
    val before = cachedCount
    (1 to 5).foreach { i =>
      Caching.scoped {
        Caching.track(Seq(i, i + 1).toDF("x")).count()
      }
      Caching.releaseAll()
    }
    assert(cachedCount === before)
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
