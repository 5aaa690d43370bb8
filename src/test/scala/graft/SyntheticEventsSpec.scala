package graft

import org.apache.spark.sql.functions._

import graft.ops.Streaming

/** DSv2 synthetic events source: partitioned, deterministic,
  * shuffle-free generation that composes with the event-time ops.
  */
class SyntheticEventsSpec extends SparkSuite {

  private def synth(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SyntheticEventsProvider")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  test("generates exactly the requested rows across the requested partitions") {
    val df = synth(10000, 8)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("rows are a pure function of id — partitioning cannot change them") {
    val a = synth(500, 2).orderBy("event_id").collect().map(_.toString)
    val b = synth(500, 7).orderBy("event_id").collect().map(_.toString)
    assert(a.sameElements(b), "row content depended on partitioning")
  }

  test("schema matches the events fixture contract") {
    assert(synth(10, 1).schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("column pruning is pushed into the source scan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = synth(1000, 2).select("user_id")
    df.count()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("user_id") && !scanLine.contains("props"),
      s"scan did not prune to user_id: $scanLine")
    // pruned read still returns correct values
    val total = df.count()
    assert(total == 1000)
  }

  test("composes with the engine's event-time operators") {
    import spark.implicits._
    val sess = Streaming.sessions(synth(5000, 4))
    assert(sess.count() > 0)
    // json props generated in-domain
    val k = synth(1000, 4)
      .select(get_json_object($"props", "$.k").cast("long").as("k"))
      .agg(min($"k"), max($"k")).head()
    assert(k.getLong(0) >= 0 && k.getLong(1) <= 99)
  }
}
