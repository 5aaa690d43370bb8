package graft

import org.apache.spark.sql.functions._

/** Throwaway r15 probe: time q_dedup_ngram's sub-pipelines. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    ops.TrainingOps.qDedupNgram(spark, dir).count()
    spark.catalog.clearCache()
    for (_ <- 1 to 2) {
      val docs = ops.core.t(spark, dir, "documents")
      val big = docs
        .select($"doc_id", $"lang", $"source", split($"text", " ").as("toks"))
        .select($"doc_id", $"lang", $"source",
          explode(array_distinct(ops.LlmOps.bigramsOf($"toks"))).as("bigram"))
      time("big.count (scan+explode)")(big.write.format("noop").mode("overwrite").save())
      val blockN = docs.groupBy($"lang", $"source").agg(count(lit(1)).as("n_block"))
      val hot = big.groupBy($"lang", $"source", $"bigram")
        .agg(count(lit(1)).as("df"))
        .join(broadcast(blockN), Seq("lang", "source"))
        .filter($"df" > least(greatest(lit(5L), floor($"n_block" / 4)), lit(64L)))
        .select($"lang", $"source", $"bigram")
      time("hot (df groupBy)")(hot.write.format("noop").mode("overwrite").save())
      val kept = big.join(broadcast(hot), Seq("lang", "source", "bigram"),
        "left_anti").transform(ops.core.cached)
      time("kept cache fill")(kept.count())
      val sizes = kept.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      time("sizes")(sizes.write.format("noop").mode("overwrite").save())
      val inter = kept.groupBy($"lang", $"source", $"bigram")
        .agg(collect_list($"doc_id").as("ds"))
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> " +
            "transform(slice(ds, i + 2, size(ds)), " +
            "y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"))
          .as("p"))
        .groupBy($"p.a".as("a_id"), $"p.b".as("b_id"))
        .agg(count(lit(1)).as("inter"))
      time("inter (container pairs)")(inter.write.format("noop").mode("overwrite").save())
      val interJ = kept.as("a").join(kept.as("b"),
          $"a.bigram" === $"b.bigram" && $"a.lang" === $"b.lang" &&
          $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
        .agg(count(lit(1)).as("inter"))
      time("inter (self-join)")(interJ.write.format("noop").mode("overwrite").save())
      val full = ops.TrainingOps.qDedupNgram(spark, dir)
      time("full key")(full.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
