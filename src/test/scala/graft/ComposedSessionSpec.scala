package graft

import graft.ops

/** Cache-lifecycle discipline (VERDICT r4 ask #5 / ADVICE r2 #4): a
  * long-lived session composing several caching ops must be able to
  * return to zero retained storage without a blunt
  * `spark.catalog.clearCache()` (which would also evict caches the
  * CALLER owns). `core.withCaches` scopes release exactly what the
  * enclosed ops pinned — tracked `core.cached` frames plus the
  * iterative ops' localCheckpoint RDD blocks.
  */
class ComposedSessionSpec extends SparkSuite {

  test("withCaches: three caching ops in one scope, zero retained storage after") {
    // Start from a clean-cache baseline: Spark's CacheManager is
    // PLAN-keyed, so a cache left by an earlier suite over the same
    // plan one of these ops caches would be SHARED with the scope and
    // released at its exit (documented withCaches caveat) — making
    // before/after differ for a reason that isn't a leak.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    var peak = 0
    ops.core.withCaches(spark) {
      // three different cache shapes: a working-set cache read twice
      // (langid's token table), a mid-pipeline cache (outliers' dev
      // frame), and an iterative op (connected components: a tracked
      // cache + per-round localCheckpoint blocks)
      assert(ops.TrainingOps.qTextLangid(spark, sf).count() > 0)
      assert(ops.Aggregates.qAggOutliers(spark, sf).count() > 0)
      assert(ops.TrainingOps.qDedupComponents(spark, sf).count() > 0)
      peak = spark.sparkContext.getPersistentRDDs.size
    }
    assert(peak > before.size,
      s"ops should have pinned storage inside the scope (peak=$peak)")
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before,
      s"scope leaked persistent RDDs: ${(after -- before).toSeq.sorted}")
  }

  test("withCaches: nested scopes release only their own storage") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    ops.core.withCaches(spark) {
      val outer = ops.core.cached(ops.core.t(spark, sf, "nation"))
      outer.count()
      val pinnedOuter = spark.sparkContext.getPersistentRDDs.keySet
      ops.core.withCaches(spark) {
        ops.core.cached(ops.core.t(spark, sf, "region")).count()
      }
      // inner scope released region's cache but left nation's alone
      assert(spark.sparkContext.getPersistentRDDs.keySet == pinnedOuter,
        "inner scope must not release the outer scope's caches")
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
  }

  test("ops still run correctly with no scope open (pre-r5 contract)") {
    // no withCaches: caches simply persist until cleared
    assert(ops.Aggregates.qAggOutliers(spark, sf).count() > 0)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
