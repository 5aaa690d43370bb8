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

  test("AQE-off-scoped ops restore the session conf (r6): no leak to later queries") {
    // the r6 iterative cores (pagerank, khop, components, kmeans,
    // semantic) run their builds under core.withConf AQE-off; a leak
    // would silently de-AQE every subsequent query in a long-lived
    // session — pin the restore, including through exceptions
    val key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    ops.core.withCaches(spark) {
      assert(ops.Graph.qGraphKhop(spark, sf).count() > 0)
      assert(ops.Graph.qGraphPagerank(spark, sf).count() > 0)
    }
    assert(spark.conf.get(key) == "true",
      "an AQE-off scope leaked spark.sql.adaptive.enabled=false")
    // exception path: conf restored even when the body throws
    intercept[RuntimeException] {
      ops.core.withConf(spark, key -> "false") {
        assert(spark.conf.get(key) == "false")
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) == "true")
    // a key previously-unset stays unset after the scope
    val novel = "spark.graft.test.novelConf"
    ops.core.withConf(spark, novel -> "x") {
      assert(spark.conf.get(novel) == "x")
    }
    assert(spark.conf.getOption(novel).isEmpty,
      "withConf must unset a conf that had no prior value")
  }
}
