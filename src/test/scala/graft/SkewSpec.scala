package graft

import org.apache.spark.sql.functions._

import graft.ops.{core, Skew}

/** Salted join: bit-identical results to the plain join, with the
  * hot key's rows spread across salt buckets.
  */
class SkewSpec extends SparkSuite {

  test("salted join == plain join on the orders⋈customer fixture") {
    import spark.implicits._
    val orders = core.t(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey",
        core.cents($"o_totalprice").as("total_c"))
    val cust = core.t(spark, sf, "customer")
      .select($"c_custkey", $"c_mktsegment")

    val plain = orders.join(cust, $"o_custkey" === $"c_custkey")
      .orderBy($"o_orderkey")
      .collect().map(_.toString)
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", "c_custkey",
        col("o_orderkey"), 8)
      .orderBy($"o_orderkey")
      .collect().map(_.toString)
    assert(salted.sameElements(plain))
  }

  test("a hot key's rows land in multiple salt buckets") {
    import spark.implicits._
    // 10k facts, ALL with the same key — the pathological case
    val facts = spark.range(10000)
      .select(lit(7L).as("k"), $"id")
    val buckets = facts
      .withColumn("salt", pmod(xxhash64($"id"), lit(8L)))
      .select("salt").distinct().count()
    assert(buckets == 8, s"expected the hot key spread over 8 buckets, got $buckets")
    // and the salted join still returns one match per fact row
    val dims = Seq((7L, "hot")).toDF("dk", "name")
    val joined = Skew.saltedJoin(facts, dims, "k", "dk", $"id", 8)
    assert(joined.count() == 10000)
  }
}
