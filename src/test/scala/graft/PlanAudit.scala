package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-audit tool (dev/judge aid): prints operator counts for
  * representative queries and regenerates PLANS.md with their
  * formatted physical plans. Run:
  *
  *   sbt "Test/runMain graft.PlanAudit"
  */
object PlanAudit {

  private val representative = Seq(
    "q_agg_groupby", "q_join_multiway", "q_join_lateral", "q_win_topk_group",
    "q_win_sessionize", "q_join_asof", "q_stream_session", "q_text_tfidf",
    "q_agg_bitmap_distinct", "q_agg_outliers", "q_ts_retention",
    "q_agg_vector_centroid", "q_agg_entropy", "q_win_gap_fill",
    "q_dedup_minhash", "q_sim_cosine_topk",
    "q_sim_ann_lsh", "q_sim_ann_ivf", "q_dedup_simhash", "q_dedup_ngram",
    "q_text_ngram", "q_sample_hash",
    // round-3/4 additions
    "q_dedup_embed_lsh", "q_win_ntile", "q_win_rangeframe",
    "q_pipeline_e2e", "q_stream_join_interval", "q_events_funnel",
    "q_text_repetition", "q_dedup_chunk", "q_agg_decay",
    "q_agg_regr_slope", "q_sql_text", "q_join_salted",
    "q_agg_corr", "q_events_transitions", "q_win_streak",
    "q_text_lang_keywords", "q_agg_moments",
    // round-4b additions
    "q_text_contamination", "q_sample_stratified", "q_text_perplexity",
    "q_graph_pagerank", "q_stream_topk", "q_ts_ohlc", "q_ml_kmeans",
    "q_ml_cluster_prune", "q_text_bpe", "q_text_bpe_apply",
    "q_profile_table", "q_drift_kl", "q_embed_quantize",
    // round-4c additions
    "q_pack_sequences", "q_mix_weights", "q_ts_anomaly", "q_graph_degree",
    "q_embed_pq", "q_dedup_semantic", "q_rag_chunk", "q_zorder_layout",
    "q_graph_cooccur", "q_sim_ann_pq", "q_scd2_intervals",
    "q_sample_fixed", "q_graph_khop", "q_sql_recursive", "q_ts_interp",
    "q_agg_gini",
    // round-5 additions
    "q_part_layout", "q_schema_evolution",
    "q_join_bucketed", "q_merge_upsert", "q_compact_files",
    "q_dedup_incremental", "q_json_variant")

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"

    val out = new StringBuilder
    out ++= "# PLANS — formatted physical plans of representative queries\n\n"
    out ++= "Regenerate with `sbt \"Test/runMain graft.PlanAudit\"` " +
      "(sf0.01, local[4], AQE-final plans after execution).\n\n" +
      "Counting caveat for cached/iterative plans (q_graph_pagerank, " +
      "q_ml_kmeans, q_text_bpe, q_text_bpe_apply): `toString` re-prints an InMemoryRelation's child " +
      "plan at every reference, so operator counts tally each cached " +
      "subtree once PER PRINT, not per execution — the cached pipeline " +
      "runs once and every other reference is an InMemoryTableScan.\n"

    for (name <- representative) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.count()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }
      val txt = p.toString
      def n(pat: String) = pat.r.findAllIn(txt).length
      val summary = f"exchanges=${n("Exchange")} bhj=${n("BroadcastHashJoin")} " +
        f"smj=${n("SortMergeJoin")} bnlj=${n("BroadcastNestedLoopJoin")} " +
        f"cart=${n("CartesianProduct")} wgl=${n("WindowGroupLimit")}"
      println(f"$name%-20s $summary")
      out ++= s"\n## $name\n\n`$summary`\n\n```\n$txt```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), out.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
