package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Pins the r7 BPE-vocabulary amortization: the learned merge table
  * persists once per (dir, JVM); q_text_bpe_apply tokenizes from the
  * artifact while q_text_bpe keeps measuring the trainer. Same
  * mechanics contract as the other persisted-artifact specs.
  */
class BpeIndexSpec extends SparkSuite {
  import spark.implicits._

  private def treeState(root: String): Map[String, Long] = {
    val d = new java.io.File(root)
    if (!d.exists()) Map.empty
    else d.listFiles().map(f => f.getName -> f.lastModified()).toMap
  }

  test("merge table builds once per JVM: re-execution reads, never rewrites") {
    val out1 = Corpus.qTextBpeApply(spark, sf).collect()
    val idx = Corpus.bpeMergesDir(spark, sf)
    val state1 = treeState(idx)
    assert(state1.nonEmpty, s"no merge-table files under $idx")
    val out2 = Corpus.qTextBpeApply(spark, sf).collect()
    assert(treeState(idx) == state1,
      "re-executing q_text_bpe_apply rewrote the merge table")
    assert(out1.toSeq == out2.toSeq,
      "tokenizing from the persisted merges diverged")
  }

  test("persisted merges equal a fresh q_text_bpe training run") {
    val stored = spark.read.parquet(Corpus.bpeMergesDir(spark, sf))
      .select($"step",
        expr("replace(trim(BOTH '|' FROM pair), '||', '+')").as("pair"),
        $"n")
      .orderBy($"step").collect().toSeq
    val fresh = Corpus.qTextBpe(spark, sf).collect().toSeq
    assert(stored == fresh,
      "persisted merge table differs from a fresh trainer run")
  }
}
