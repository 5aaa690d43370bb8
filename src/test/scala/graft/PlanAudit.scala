package graft
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- Seq("q_join_multiway", "q_text_tfidf", "q_stream_session",
        "q_dedup_ngram", "q_text_langid", "q_join_asof", "q_dedup_minhash")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.count()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }
      val txt = p.toString
      def n(pat: String) = pat.r.findAllIn(txt).length
      println(f"$name%-18s exchanges=${n("Exchange")}%2d bhj=${n("BroadcastHashJoin")}%2d smj=${n("SortMergeJoin")}%2d bnlj=${n("BroadcastNestedLoopJoin")}%2d cart=${n("CartesianProduct")}%2d wgl=${n("WindowGroupLimit")}%2d")
    }
    spark.stop()
  }
}
