package graft
import java.nio.file.{Files, Paths}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.builder(4, 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val sb = new StringBuilder
    for (q <- Seq("p2_project_filter","j1_multi_join","a1_grouped_sum","w6_cumsum",
                  "j5_semi_join","dd_minhash","dd_simhash","dd_embedding_neardups",
                  "dd_editdist","sim_cosine_topk","sim_lsh_topk","bt_backtest_fold",
                  "w4_last_period","ts_langid_scores","opt_grid","sim_ivf_topk",
                  "j9_asof_join","j10_range_join","dd_ngram_jaccard",
                  "a9_quantiles","ts_repetition","ts_strat_sample",
                  "a11_rollup","a12_pivot","w12_rolling_time",
                  "j12_bloom_prune_join","dd_contamination",
                  "dd_semantic","dd_semantic_prune","dd_keep_best",
                  "ts_lm_score",
                  "ts_domain_mix","dd_repeated_ngram_scrub",
                  "dd_incremental_minhash","dd_stream_incremental_batch",
                  "dd_semantic_incremental",
                  "ts_lm_buckets","sim_knn_label",
                  "ts_bm25_topk","ts_bm25_probe","sc_profile","sc_skew",
                  "ts_gopher_filter","sim_label_centroids",
                  "sc_cms_counts","sc_cms_join_est","sc_hll_distinct",
                  "ev_hll_daily","gr_labelprop",
                  "j13_auto_join","sim_ivf_refined","ts_token_budget",
                  "ev_funnel","ev_funnel_summary","ev_stream_funnel_batch",
                  "dd_group_split",
                  "ts_logreg_score","sc_kmv_distinct","sc_kmv_setops",
                  "ev_kmv_daily","ev_cohort_retention","dd_dup_spans",
                  "dd_containment",
                  "gr_triangles","ev_stream_sessionize_batch","u5_scd2",
                  "sc_sample_quantiles","ts_priority_sample",
                  "sc_topk_sketch","sim_pq_encode","sim_pq_topk",
                  "sc_group_quantiles","ts_group_priority_sample",
                  "sim_ivfpq_topk","u5_scd2_stream_batch",
                  "sc_group_quantiles_stream_batch",
                  "ts_group_priority_stream_batch","mm_gif89a_frames",
                  "sim_ivfadc_topk","sim_ivfadc_incremental",
                  "ts_bm25_stream_batch","mm_mjpeg_frames",
                  "ts_bm25_eval")) {
      sb.append(s"\n## $q\n\n```\n")
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      sb.append(plan.linesIterator.map(_.take(170)).mkString("\n"))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/tmp/plans_body.md"), sb.toString)
    spark.stop()
  }
}
