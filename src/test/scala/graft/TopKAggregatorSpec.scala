package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.ops.core

/** The typed-Aggregator extension surface: bounded top-k must agree
  * with the window-function formulation on real data.
  */
class TopKAggregatorSpec extends SparkSuite {

  test("TopKNeighbors ranks by (rawcos desc, bId asc) with bounded buffers") {
    import graft.functions.{Neighbor, TopKNeighbors}
    val agg = new TopKNeighbors(2)
    val items = Seq(
      Neighbor(5L, 1, 0.9), Neighbor(3L, 1, 0.9), // tie -> smaller id first
      Neighbor(9L, 2, 0.95), Neighbor(7L, 0, 0.1), Neighbor(2L, 0, 0.5))
    // run through reduce (exercises the amortized trim) then finish
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(agg.merge(agg.zero, buf))
    assert(out == Seq(Neighbor(9L, 2, 0.95), Neighbor(3L, 1, 0.9)),
      s"got $out")
  }

  test("TopKAggregator(3) matches row_number()<=3 per customer") {
    import spark.implicits._
    val orders = core.t(spark, sf, "orders")
      .select($"o_custkey", core.cents($"o_totalprice").as("total_c"),
        $"o_orderkey")
    val agg = new TopKAggregator(3).toColumn
    val viaAgg = orders.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .toDF("o_custkey", "topk")

    // collect_list order is not guaranteed — sort by rn inside the array
    val viaWindow = graft.ops.Windows.qWinTopkGroup(spark, sf)
      .groupBy($"o_custkey")
      .agg(expr("""array_join(transform(array_sort(
             collect_list(struct(rn, concat(total_c, ':', o_orderkey)))),
             x -> x.col2), ',')""").as("expected"))

    val joined = viaAgg.join(viaWindow, "o_custkey")
    assert(joined.count() > 0)
    val bad = joined.filter($"topk" =!= $"expected").count()
    assert(bad == 0, "aggregator top-k diverged from window top-k")
  }

  test("partial buffers never exceed k") {
    val a = new TopKAggregator(2)
    val b = (1L to 10L).foldLeft(a.zero)((acc, i) => a.reduce(acc, (i, i)))
    assert(b.size == 2)
    assert(a.merge(b, b).size == 2)
    assert(a.finish(b) == "10:10,9:9")
  }
}
