package graft

import org.apache.spark.sql.functions._

import graft.ops.TrainingOps

/** Pins the r6 IVF index amortization (VERDICT r5 task 4): the n·√n
  * centroid assignment is a per-(dir, JVM) BUILD that persists the
  * (cell, vec_id, emb, nrm) index parquet; serving executions re-READ
  * it. The key's output itself stays under the t2 oracle gate — these
  * tests pin the amortization mechanics the gate can't see.
  */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  private def treeState(root: String): Map[String, Long] = {
    val d = new java.io.File(root)
    if (!d.exists()) Map.empty
    else d.listFiles().map(f => f.getName -> f.lastModified()).toMap
  }

  test("ivf index builds once per JVM: a re-execution reads, never rewrites") {
    val out1 = TrainingOps.qSimAnnIvf(spark, sf).collect()
    val idx = TrainingOps.ivfIndexDir(spark, sf)
    val state1 = treeState(idx)
    assert(state1.nonEmpty, s"no index files under $idx")
    // second execution: same rows, byte-identical index tree (no
    // rewrite — the ConcurrentHashMap memo short-circuits the build)
    val out2 = TrainingOps.qSimAnnIvf(spark, sf).collect()
    assert(treeState(idx) == state1,
      "re-executing q_sim_ann_ivf rewrote the index tree")
    assert(out1.toSeq == out2.toSeq,
      "serving from the persisted index diverged from the first run")
  }

  test("ivf index partitions the corpus: every vector in exactly one cell") {
    val idx = spark.read.parquet(TrainingOps.ivfIndexDir(spark, sf))
    val n = ops.core.t(spark, sf, "embeddings").count()
    assert(idx.count() == n)
    assert(idx.select($"vec_id").distinct().count() == n)
    // adaptive cell count: max(16, ceil(sqrt n)) distinct cells exist
    // (hash-ranked seeds guarantee every cell id is somebody's seed,
    // and a seed's nearest centroid is itself)
    val expectCells = math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong)
    assert(idx.select($"cent_id").distinct().count() == expectCells)
  }
}
