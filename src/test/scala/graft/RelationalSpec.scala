package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.ops.Relational

/** SURVEY §2.1–§2.4, §2.6–§2.7: every registered relational query runs
  * and returns a sane shape; physical-plan assertions for the
  * pushdown/broadcast/sort-merge claims.
  */
class RelationalSpec extends SparkSuite {

  // Rows expected > 0 for every relational key at sf0.001.
  for ((name, fn) <- Relational.queries) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("q_agg_groupby has the 6 flag×status groups") {
    assert(Relational.qAggGroupby(spark, sf).count() == 6)
  }

  /** Full physical plan text, AQE-unwrapped (after materializing). */
  private def planText(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    val p = df.queryExecution.executedPlan
    val inner = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    inner.toString
  }

  test("q_scan_pushdown pushes the shipdate predicate into parquet") {
    val txt = planText(Relational.qScanPushdown(spark, sf))
    assert(txt.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"no pushed filter in plan:\n$txt")
  }

  test("q_scan_pruned reads only 3 columns from parquet") {
    val txt = planText(Relational.qScanPruned(spark, sf))
    val read = txt.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity") &&
      read.contains("l_shipdate") && !read.contains("l_extendedprice"),
      s"unexpected ReadSchema: $read")
  }

  test("q_join_broadcast plans broadcast exchanges for the dims") {
    val txt = planText(Relational.qJoinBroadcast(spark, sf))
    assert(txt.contains("BroadcastHashJoin"), s"no broadcast join in:\n$txt")
  }

  test("large-large equi join uses sort-merge when broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val txt = planText(Relational.qJoinMergeLarge(spark, sf))
      assert(txt.contains("SortMergeJoin"), s"no SMJ in:\n$txt")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q_topk_global returns exactly 10 rows, sorted desc") {
    val rows = Relational.qTopkGlobal(spark, sf).collect()
    assert(rows.length == 10)
    val totals = rows.map(_.getLong(1))
    assert(totals.sameElements(totals.sortBy(-_)))
  }

  test("q_set_union_all keeps duplicates that union_dist removes") {
    val all = Relational.qSetUnionAll(spark, sf).count()
    val dist = Relational.qSetUnionDist(spark, sf).count()
    assert(all > dist)
  }

  test("queries and oracle keys line up") {
    val q = Relational.queries.keySet
    val o = Relational.oracle.keySet
    assert(o.subsetOf(q), s"oracle keys without query: ${o -- q}")
  }
}
