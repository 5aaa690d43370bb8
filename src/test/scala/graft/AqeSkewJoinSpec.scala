package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ops.core

/** AQE's skew-join split (VERDICT r8 task 6): `q_join_salted` proves
  * the MANUAL skew escape hatch; this pins that Spark's own
  * `OptimizeSkewedJoin` fires on a deterministically skewed
  * sort-merge join and that the split changes nothing semantically —
  * the untested half of the repo's 100 TB join posture (SCALING.md's
  * "AQE skew-join for the keys you didn't predict" claim).
  *
  * The skew is hash-free and extreme by construction: half the left
  * rows share key 0, the rest spread over 999 keys, so one
  * post-shuffle partition carries ~500× the median bytes. The scoped
  * confs force the SMJ path (no broadcast) and drop the skew
  * thresholds to probe scale — production defaults (256 MB) would
  * need GBs per partition to trigger, which is exactly the 1000-
  * executor situation being modeled.
  */
class AqeSkewJoinSpec extends SparkSuite {

  test("OptimizeSkewedJoin splits the skewed partition; results unchanged") {
    val s = spark
    import s.implicits._
    def left = spark.range(0, 400000)
      .select(
        when($"id" % 2 === 0, 0L).otherwise($"id" % 999L).as("k"),
        ($"id" % 97L).as("v"))
    def right = spark.range(0, 1000)
      .select($"id".as("k"), ($"id" % 7L).as("w"))
    // aggregate on v, NOT the join key: a group-by on k would reuse
    // the SMJ's output partitioning, and OptimizeSkewedJoin declines
    // to split a partition a downstream operator's required
    // distribution depends on (splitting would force a re-shuffle)
    def joined = left.join(right, "k")
      .groupBy($"v").agg(count(lit(1)).as("n"), sum($"k" + $"w").as("sv"))

    val aqeConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // probe-scale thresholds: the skewed partition (~200k rows) must
      // exceed factor * median AND the byte threshold
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // force the SMJ path: a broadcast join has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    val (adaptiveRows, sawSkewSplit) =
      core.withConf(spark, aqeConfs: _*) {
        // inspect the SAME Dataset instance that is executed — the
        // adaptive plan only reaches its final (skew-split) form
        // after materialization
        val df = joined.orderBy($"v")
        val rows = df.collect().map(_.toSeq).toSeq
        val plan = df.queryExecution.executedPlan
        val finalPlan = plan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        // OptimizeSkewedJoin marks the SMJ with isSkewJoin=true and
        // reads the skewed partition as multiple slices via
        // AQEShuffleRead; both render in the plan string
        (rows, finalPlan.toString.contains("skew=true"))
      }
    assert(sawSkewSplit,
      "adaptive plan shows no skew-split SMJ (skew=true missing)")

    val plainRows = core.withConf(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      joined.orderBy($"v").collect().map(_.toSeq).toSeq
    }
    assert(adaptiveRows == plainRows,
      "skew-split adaptive join changed the aggregated results")
  }
}
