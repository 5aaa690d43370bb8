package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Pins the two Misra–Gries guarantees (scaladoc) on data where they
  * bite: a synthetic Zipf stream with genuine heavy hitters (the
  * fixture corpus is deliberately near-uniform, so no t2 key uses the
  * sketch). Guarantees must hold under ANY partitioning — checked at
  * 1 and 13 partitions; the summaries themselves may differ.
  */
class MisraGriesSpec extends SparkSuite {
  import spark.implicits._

  // item "w<i>" appears 6000/i times, i = 1..300: true Zipf, heavy
  // head (w1 = 6000 of n ≈ 37k ≈ 16 %), 300 distinct >> k
  private def zipf(parts: Int) = spark.range(1, 301)
    .select(concat(lit("w"), $"id").as("item"),
      expr("array_repeat(1, CAST(6000 / id AS INT))").as("reps"))
    .select($"item", explode($"reps"))
    .select($"item").repartition(parts).as[String]

  private def exactCounts(parts: Int): Map[String, Long] =
    zipf(parts).groupBy($"item").count().as[(String, Long)].collect().toMap

  test("exact when distinct <= k (no decrement ever fires)") {
    val ds = spark.range(0, 10000)
      .select(concat(lit("t"), $"id" % 7).as("item")).as[String]
    val got = ds.select(new MisraGries(16).toColumn).head()
    val want = ds.groupBy($"item").count().as[(String, Long)].collect().toMap
    assert(got == want)
  }

  for (parts <- Seq(1, 13)) {
    test(s"zipf guarantees hold at $parts partition(s), k=49") {
      val exact = exactCounts(parts)
      val n = exact.values.sum
      val k = 49
      val got = zipf(parts).select(new MisraGries(k).toColumn).head()
      val bound = n / (k + 1)
      // (1) every item with freq > n/(k+1) survives
      for ((item, c) <- exact if c > bound)
        assert(got.contains(item), s"heavy $item ($c > $bound) missing")
      // (2) estimates never exceed truth and undercount by <= n/(k+1)
      for ((item, est) <- got) {
        val truth = exact(item)
        assert(est <= truth, s"$item overcounted: $est > $truth")
        assert(truth - est <= bound,
          s"$item undercounted beyond bound: $truth - $est > $bound")
      }
      // state really is bounded
      assert(got.size <= k)
    }
  }
}
