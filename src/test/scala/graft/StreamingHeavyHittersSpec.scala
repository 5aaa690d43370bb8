package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.ops.Aggregates
import graft.streaming.MisraGriesProcessor

/** The streaming runtime twin of q_agg_heavyhitters: the SAME derived
  * skewed item universe flows as an unbounded stream through the
  * sharded Misra–Gries `transformWithState` processor (O(k) state per
  * shard forever), and the two-pass contract must survive the
  * stream/batch boundary — union of final shard summaries ⊇ every
  * globally-heavy item (the sharded-MG guarantee), and the exact
  * recount of those candidates reproduces the registered batch key's
  * output row for row. Runs on the RocksDB state store provider like
  * the other transformWithState pipelines.
  */
class StreamingHeavyHittersSpec extends SparkSuite {

  test("streaming sharded MG + exact recount == batch q_agg_heavyhitters") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val items = Aggregates.skewedItems(spark, sf)
        .select($"item".cast("string").as("item")).as[String].collect()
      val shards = 8
      val tuples = items.map(i => (math.floorMod(i.hashCode, shards), i))

      val mem = MemoryStream[(Int, String)]
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new MisraGriesProcessor(128),
          TimeMode.None(), OutputMode.Update())
        .toDF("shard", "seq", "items", "counts", "err")
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("mg_sink").start()
      // three micro-batches: the summary must accumulate ACROSS
      // batches through typed state, not within one batch
      tuples.grouped(math.max(1, tuples.length / 3 + 1)).foreach { c =>
        mem.addData(c.toSeq); q.processAllAvailable()
      }
      q.stop()

      // latest summary per shard via the strictly-increasing seq
      val finals = spark.table("mg_sink")
        .groupBy($"shard")
        .agg(max_by($"items", $"seq").as("items"))
        .select($"items").as[Array[String]].collect()
      val candidates = finals.flatten.map(_.toLong).toSet

      // sharded-MG guarantee: candidates ⊇ the batch key's heavy set
      val batch = Aggregates.qAggHeavyHitters(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(batch.map(_._1).toSet.subsetOf(candidates),
        "a globally-heavy item is missing from the streamed shard summaries")

      // exact recount of the streamed candidates reproduces the
      // registered batch output row for row
      val n = items.length.toLong
      val recount = Aggregates.skewedItems(spark, sf)
        .filter($"item".isin(candidates.toSeq: _*))
        .groupBy($"item").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * 64 > n)
        .orderBy($"item").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(recount.toSeq == batch.toSeq,
        "streamed-candidate recount differs from the batch heavy set")

      spark.catalog.dropTempView("mg_sink")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("shard state stays hard-bounded at k entries across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // drive the REAL processor: 300 distinct items per shard across
      // three micro-batches through capacity 4 — every EMITTED
      // summary (the state row as written) must hold <= 4 counters,
      // which fails if the restore/update path ever appends instead
      // of MG-reducing or stores pre-truncation state
      val mem = MemoryStream[(Int, String)]
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new MisraGriesProcessor(4),
          TimeMode.None(), OutputMode.Update())
        .toDF("shard", "seq", "items", "counts", "err")
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("mg_bound_sink").start()
      (0 until 3).foreach { batch =>
        mem.addData((0 until 100).map(i => (i % 2, s"item_${batch}_$i")))
        q.processAllAvailable()
      }
      q.stop()
      val sizes = spark.table("mg_bound_sink")
        .select(size($"items").as("n")).as[Int].collect()
      assert(sizes.nonEmpty && sizes.forall(_ <= 4),
        s"a shard summary exceeded capacity 4: ${sizes.toSeq}")
      spark.catalog.dropTempView("mg_bound_sink")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
