package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** The Morton-interleave expression behind q_zorder_layout: parity
  * with a naive bit-loop reference, range bounds, and codegen-path
  * agreement with interpreted eval.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Bit-at-a-time reference: z bit 2i = x bit i, bit 2i+1 = y bit i. */
  private def slowInterleave(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("magic-mask interleave matches the bit-loop reference") {
    val rnd = new Random(42) // seeded: failures reproduce exactly
    for (_ <- 1 to 2000) {
      val x = (rnd.nextInt() & 0xFFFF).toLong
      val y = (rnd.nextInt() & 0xFFFF).toLong
      assert(ZOrder.interleave(x, y) == slowInterleave(x, y))
    }
    // edges
    for (x <- Seq(0L, 1L, 0xFFFFL); y <- Seq(0L, 1L, 0xFFFFL))
      assert(ZOrder.interleave(x, y) == slowInterleave(x, y))
    assert(ZOrder.interleave(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
  }

  test("expression through codegen equals direct eval and stays 32-bit") {
    val df = spark.range(0, 2000).select(
      ($"id" * 37 % 65536).as("x"), ($"id" * 101 % 65536).as("y"))
    val out = df.select($"x", $"y", ZOrder.zorder($"x", $"y").as("z"))
      .collect()
    out.foreach { r =>
      val z = r.getAs[Long]("z")
      assert(z == ZOrder.interleave(r.getAs[Long]("x"), r.getAs[Long]("y")))
      assert(z >= 0 && z <= 0xFFFFFFFFL)
    }
  }

  test("graft_zorder is callable from SQL text after register()") {
    ZOrder.register(spark)
    val z = spark.sql("SELECT graft_zorder(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS z")
      .head().getLong(0)
    // x=3 → bits 0,1 at even positions = 0b0101; y=5 → bits 0,2 at odd
    // positions = 0b100010; z = 0b100111 = 39
    assert(z == 39L)
  }
}
