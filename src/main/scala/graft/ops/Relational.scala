package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import core._

/** Relational operators: scans, projections, filters, joins,
  * aggregations (SURVEY §2.1–§2.4).
  *
  * Semantics derive from the reference capability sentence
  * (`/root/reference/README.md:2` — "complex transformations on ...
  * collections") expressed Spark-first: declarative DataFrame plans,
  * Catalyst does pushdown/pruning/join-selection.
  */
object Relational {

  /** Flagship: TPC-H Q1 shape. Group lineitem by (returnflag,
    * linestatus) with 8 aggregates, shipdate filter. All money math in
    * exact integer cents (LongType) so that sums are bit-identical in
    * both engines; averages are derived from the exact sums by a
    * single identical division, then rounded.
    */
  def qAggGroupby(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .select(
        $"l_returnflag", $"l_linestatus",
        cents($"l_quantity").as("qty_c"),
        cents($"l_extendedprice").as("price_c"),
        cents($"l_discount").as("disc_pct"),
        cents($"l_tax").as("tax_pct"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("count_order"),
        sum($"qty_c").as("sum_qty_c"),
        sum($"price_c").as("sum_base_price_c"),
        sum($"price_c" * (lit(100L) - $"disc_pct")).as("sum_disc_price_c4"),
        sum($"price_c" * (lit(100L) - $"disc_pct") * (lit(100L) + $"tax_pct"))
          .as("sum_charge_c6"),
        sum($"disc_pct").as("sum_disc_pct"))
      .select(
        $"l_returnflag", $"l_linestatus", $"count_order",
        $"sum_qty_c", $"sum_base_price_c", $"sum_disc_price_c4",
        $"sum_charge_c6",
        r6($"sum_qty_c" / 100.0 / $"count_order").as("avg_qty"),
        r6($"sum_base_price_c" / 100.0 / $"count_order").as("avg_price"),
        r6($"sum_disc_pct" / 100.0 / $"count_order").as("avg_disc"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_groupby" -> (qAggGroupby _)
  )

  val oracle: Map[String, String] = Map(
    "q_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_c4,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_c6,
        |  round(CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_disc
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
