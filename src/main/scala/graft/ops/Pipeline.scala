package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import core._

/** End-to-end training-data pipeline composing the engine's operators
  * into the shape a 100 TB corpus run takes: ingest → quality filter →
  * exact dedup → near-dup candidate pruning → language tagging →
  * tokenize/count → deterministic sample split → partitioned write.
  *
  * Every stage is a declarative DataFrame transform (single Catalyst
  * plan until the write), so Catalyst fuses the filters and the only
  * materialization points are the aggregation/join shuffles the
  * semantics require.
  */
object Pipeline {

  /** Stage 1: quality gate — drop low-lexical-diversity and too-short
    * docs (thresholds are pipeline parameters).
    */
  def qualityGate(docs: DataFrame, minTokens: Long = 15,
      minDistinctRatio: Double = 0.3): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("toks", split($"text", " "))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .withColumn("n_distinct", size(array_distinct($"toks")).cast("long"))
      .filter($"n_tokens" >= minTokens &&
        $"n_distinct" >= $"n_tokens" * minDistinctRatio)
      .drop("toks")
  }

  /** Stage 2: exact dedup on the rolling-hash fingerprint, keeping
    * the smallest doc_id per fingerprint (deterministic).
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"fp").orderBy($"doc_id")
    docs
      .withColumn("fp",
        expr("""aggregate(sequence(1, length(text)), 0L,
                (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007)"""))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .drop("rn", "fp")
  }

  /** Stage 3: near-dup pruning — from each MinHash-LSH candidate
    * pair, drop the larger doc_id (keep-first policy).
    */
  def nearDupPrune(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val sig = LlmOps.minhashSignatures(docs)
    val bandCols = (0 until LlmOps.MinhashBands).map { b =>
      val rows = (0 until LlmOps.MinhashSeeds / LlmOps.MinhashBands)
        .map(r => col(s"m${b * (LlmOps.MinhashSeeds / LlmOps.MinhashBands) + r}"))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("bh"))
    }
    val buckets = sig.select($"doc_id", explode(array(bandCols: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bh".as("bh"))
    val losers = buckets.as("x").join(buckets.as("y"),
        $"x.band" === $"y.band" && $"x.bh" === $"y.bh" &&
        $"x.doc_id" < $"y.doc_id")
      .select($"y.doc_id".as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Stage 4: annotate with predicted language agreement + token
    * stats + the deterministic train/val split bucket.
    */
  def annotate(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("bucket",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
      .withColumn("split", when($"bucket" < 90, "train").otherwise("val"))
      .drop("bucket")
  }

  /** Full pipeline; `outDir` optional — when set, writes the result
    * partitioned by (lang, split) for pruned downstream reads.
    */
  def run(spark: SparkSession, dir: String, outDir: Option[String] = None)
      : DataFrame = {
    val docs = t(spark, dir, "documents")
    val cleaned = annotate(nearDupPrune(exactDedup(qualityGate(docs))))
    outDir.foreach { o =>
      cleaned.write.partitionBy("lang", "split").mode("overwrite").parquet(o)
    }
    cleaned
  }
}
