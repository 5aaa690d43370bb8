package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for all operator builders.
  *
  * Capability contract derives from `/root/reference/README.md:2`
  * ("Apply complex transformations on single events or collections");
  * everything here is an idiomatic Spark re-expression, not a port.
  *
  * Cache lifecycle (ADVICE r2): some ops `.cache()` an intermediate
  * that their plan reads twice (langid's token table, tf-idf's tf,
  * minhash signatures, …). The op cannot unpersist it itself — the
  * returned DataFrame is lazy and still references the cached plan.
  * Contract: callers owning a long-lived session clear between ops
  * (`spark.catalog.clearCache()` PLUS unpersisting
  * `sparkContext.getPersistentRDDs` for localCheckpoint blocks), as
  * Bench/Verify both do; Pipeline-style compositions that keep many
  * ops live accept the pinned storage as working-set by design.
  */
object core {

  /** Load one fixture table from the scale-factor directory. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects outright. Read nanos as raw longs and rebuild a
    * proper microsecond TimestampType column — lossless: every fixture
    * value has a zero sub-microsecond component (verified via DuckDB
    * `epoch_ns(ts) % 1000 = 0` on all rows).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact money/quantity in integer cents: fixture doubles are
    * 2-dp-generated (verified — max |x*100 - round(x*100)| < 1e-8),
    * so this is a lossless, engine-agnostic representation that makes
    * SUM() bit-identical across Spark and the DuckDB oracle.
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** The DuckDB-SQL twin of [[cents]] — ONE definition so the Spark
    * and oracle sides of the cents convention can never silently
    * fork (file-local copies delegated here in r4b).
    */
  def centsSql(col: String): String = s"CAST(round($col*100) AS BIGINT)"

  /** Deterministic double output: round at the very end, same depth
    * as the oracle SQL. Spark `round` = HALF_UP, which MATCHES DuckDB
    * `round` on DOUBLE inputs (half-away-from-zero — verified:
    * `round(0.5623125::DOUBLE, 6)` → 0.562313 in both engines; the
    * HALF_EVEN behavior often attributed to DuckDB applies to DECIMAL
    * inputs only). `bround` (HALF_EVEN) would DIVERGE at double
    * midpoints — the sf0.01 q_text_quality fixture actually hits one.
    */
  def r4(c: Column): Column = round(c, 4)
  def r6(c: Column): Column = round(c, 6)
}
