package graft

import org.apache.spark.sql.functions._

import graft.ops.Clustering

/** Pins the r7 PQ-index amortization: codebooks + corpus codes persist
  * once per (dir, JVM); q_sim_ann_pq's ADC serving reads the artifact
  * while q_embed_pq keeps measuring the build. Same mechanics contract
  * as the other persisted-artifact specs: build-once, read ≡ rebuild.
  */
class PqIndexSpec extends SparkSuite {
  import spark.implicits._

  private def treeState(root: String): Map[String, Long] = {
    val d = new java.io.File(root)
    if (!d.exists()) Map.empty
    else d.listFiles().toSeq.flatMap { sub =>
      if (sub.isDirectory)
        sub.listFiles().toSeq
          .map(f => s"${sub.getName}/${f.getName}" -> f.lastModified())
      else Seq(sub.getName -> sub.lastModified())
    }.toMap
  }

  test("pq index builds once per JVM: re-execution reads, never rewrites") {
    val out1 = Clustering.qSimAnnPq(spark, sf).collect()
    val idx = Clustering.pqIndexDir(spark, sf)
    val state1 = treeState(idx)
    assert(state1.nonEmpty, s"no pq index files under $idx")
    val out2 = Clustering.qSimAnnPq(spark, sf).collect()
    assert(treeState(idx) == state1,
      "re-executing q_sim_ann_pq rewrote the pq index tree")
    assert(out1.toSeq == out2.toSeq,
      "serving ADC from the persisted pq index diverged")
  }

  test("persisted codes reproduce q_embed_pq's packed codes exactly") {
    val idx = Clustering.pqIndexDir(spark, sf)
    // repack the persisted per-subspace codes into the 32-bit code
    // q_embed_pq emits; they must agree bit-for-bit
    val repacked = spark.read.parquet(s"$idx/codes")
      .groupBy($"vec_id")
      .agg(sum(expr(
        "CAST(xcent - 1 AS BIGINT) * shiftleft(CAST(1 AS BIGINT), xs * 4)"))
        .as("code"))
      .orderBy($"vec_id")
      .select($"vec_id", $"code").collect().toSeq
    val fresh = Clustering.qEmbedPq(spark, sf)
      .select($"vec_id", $"code").collect().toSeq
    assert(repacked == fresh,
      "persisted pq codes differ from a fresh q_embed_pq build")
  }
}
