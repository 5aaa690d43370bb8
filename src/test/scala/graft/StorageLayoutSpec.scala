package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ops.core

/** Storage-layout levers that matter at 100 TB: directory
  * partitioning (partition pruning skips data at the file-listing
  * level) and bucketing (co-located joins skip the shuffle entirely).
  */
class StorageLayoutSpec extends SparkSuite {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.count()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("partitionBy(lang) write → filtered read prunes partitions") {
    val dir = Files.createTempDirectory("graft_part").toString
    val docs = core.t(spark, sf, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    val txt = finalPlan(back)
    assert(txt.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in:\n$txt")
    val expected = docs.filter(col("lang") === "en").count()
    assert(back.count() == expected)
    // pruning is structural: only the lang=en directory is listed
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.contains("lang=en") && dirs.size == 5)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val orders = core.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        core.cents(col("o_totalprice")).as("total_c"))
    val li = core.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), core.cents(col("l_quantity")).as("qty_c"))

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("qty_c")).as("q"))
      val txt = finalPlan(joined)
      // the join itself must not shuffle: both sides are pre-bucketed
      // on the key, so the only exchange left is the final group-by
      val joinSection = txt.substring(0, txt.length)
      assert(txt.contains("SortMergeJoin"), s"expected SMJ in:\n$txt")
      val exchanges = "Exchange".r.findAllIn(txt).length
      assert(exchanges == 1,
        s"bucketed join should leave only the group-by exchange, got $exchanges:\n$txt")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
