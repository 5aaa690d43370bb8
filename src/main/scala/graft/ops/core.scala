package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for all operator builders.
  *
  * Capability contract derives from `/root/reference/README.md:2`
  * ("Apply complex transformations on single events or collections");
  * everything here is an idiomatic Spark re-expression, not a port.
  *
  * Cache lifecycle (ADVICE r2, closed r5): some ops cache an
  * intermediate that their plan reads twice (langid's token table,
  * tf-idf's tf, minhash signatures, …). The op cannot unpersist it
  * itself — the returned DataFrame is lazy and still references the
  * cached plan — so every op-internal cache goes through [[cached]],
  * which registers the frame with the innermost [[withCaches]] scope.
  * Long-lived-session callers wrap each unit of work (run-op +
  * materialize) in `core.withCaches(spark) { … }` and get back to
  * zero retained storage deterministically (ComposedSessionSpec pins
  * this); Bench/Verify wrap every key execution. Calling ops with no
  * scope open still works — the caches simply live until
  * `spark.catalog.clearCache()`, the pre-r5 contract.
  */
object core {

  private val cacheScope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]

  /** `.cache()` for op internals: identical semantics, plus the frame
    * is tracked by the innermost [[withCaches]] scope (if any) so a
    * composed session can release the whole working set on exit.
    * Chain-friendly via `.transform(core.cached)`.
    */
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    val scope = cacheScope.get()
    if (scope != null) scope += c
    c
  }

  /** Run `body` (an op + the actions that materialize its result) and
    * release every piece of storage it pinned: frames registered via
    * [[cached]], plus any RDD newly persisted inside the scope
    * (localCheckpoint blocks of the iterative ops, which
    * `Dataset.unpersist` can't reach). Scopes nest: an inner scope
    * releases only its own storage. Blocking unpersists — on exit the
    * release has happened, not merely been requested.
    *
    * Caveat (Spark semantics, not a tracker bug): `CacheManager` is
    * PLAN-keyed — if the caller already cached a plan identical to one
    * an enclosed op caches, `cache()` reuses that shared entry and the
    * scope's exit unpersists it for both parties. Callers who pin
    * their own caches should not cache the exact plans the ops build
    * internally (ComposedSessionSpec documents the sharing).
    */
  def withCaches[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val outer = cacheScope.get()
    val mine = new scala.collection.mutable.ArrayBuffer[DataFrame]
    cacheScope.set(mine)
    try body
    finally {
      cacheScope.set(outer)
      mine.foreach { df =>
        try df.unpersist(blocking = true) catch { case _: Exception => () }
      }
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) {
          try rdd.unpersist(blocking = true)
          catch { case _: Exception => () }
        }
      }
    }
  }

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
