package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipelines

class PipelinesSpec extends SparkSpecBase {
  import spark.implicits._

  test("withPersisted caches during the body and releases after") {
    val df = spark.range(1000).select(col("id"), (col("id") * 3).as("v"))
    val out = Pipelines.withPersisted(df) { cached =>
      assert(cached.storageLevel.useMemory || cached.storageLevel.useDisk)
      // two consumers read the cache, not the source
      val a = cached.agg(sum("v")).as[Long].head()
      val b = cached.filter(col("id") < 10).count()
      (a, b)
    }
    assert(out === ((1498500L, 10L)))
    assert(!df.storageLevel.useMemory && !df.storageLevel.useDisk) // released
  }

  test("withPersisted unpersists even when the body throws") {
    val df = spark.range(10).toDF("id")
    intercept[RuntimeException] {
      Pipelines.withPersisted(df) { cached =>
        cached.count()
        throw new RuntimeException("boom")
      }
    }
    assert(!df.storageLevel.useMemory && !df.storageLevel.useDisk)
  }

  test("withPersistedAll scopes several relations") {
    val a = spark.range(10).toDF("id")
    val b = spark.range(20).toDF("id")
    Pipelines.withPersistedAll(Seq(a, b)) {
      assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
      assert(b.count() === 20L)
    }
    assert(!a.storageLevel.useMemory && !b.storageLevel.useMemory)
  }
}
