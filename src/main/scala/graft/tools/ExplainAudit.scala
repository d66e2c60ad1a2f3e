// Plan audit: run with `sbt "Test / runMain graft.tools.ExplainAudit"`.
// Prints the formatted physical plan of each headline query at sf0.01 so
// broadcast/pushdown/codegen decisions can be reviewed (100 TB design gate).
package graft.tools

import graft._

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "explain-audit")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("q1_pricing_summary", "q2_revenue_by_segment",
      "q3_top_orders", "q5_region_revenue", "q8_top_customers",
      "q20_win_tumbling", "q34_ngram_jaccard", "q35_minhash_lsh",
      "q40_knn_cosine", "q45_lsh_neardup", "q48_ivf_knn", "q60_trailing_window",
      "q65_repetition", "q66_source_mix", "q67_neardup_clusters",
      "q68_simhash_neardup", "q71_boilerplate", "q73_decontaminate",
      "q74_pq_search", "q75_kmeans_train", "q77_seq_pack",
      "q78_zipf_coverage", "q80_source_kl", "q81_sq8_error",
      "q86_cdc_chunks", "q87_source_overlap", "q88_mrl_agreement",
      "q89_rfm", "q90_countmin", "q91_bloom_prefilter",
      "q92_dedup_funnel", "q93_small_qty_revenue",
      "q94_sole_return_supplier", "q95_lexicon_scrub",
      "q96_dim_stats", "q97_centroid_probe",
      "q54_bow_dedup", "q55_containment", "q56_word_bigrams",
      "q57_click_attribution", "q58_temp_sample", "q59_chunk_manifest",
      "q100_bigram_lm", "q101_dataset_card", "q102_pq_rerank",
      "q103_cluster_split", "q104_crossmodal", "q105_market_share",
      "q106_lsh_recall_sweep", "q107_band_recall_sweep",
      "q108_pair_degrees", "q109_gap_percentiles",
      "q110_threshold_sensitivity", "q111_ann_scoreboard",
      "q112_cas_accounting", "q113_vocab_growth",
      "q114_watermark_audit", "q115_skew_report",
      "q125_large_volume_orders", "q126_small_qty_revenue",
      "q127_dominant_suppliers", "q128_top_revenue_supplier",
      "q129_order_count_distribution", "q130_disjunctive_revenue",
      "q131_sales_opportunity", "q132_important_parts",
      "q133_supplier_diversity", "q134_hll_distinct",
      "q135_profit_by_nation_year", "q136_sampled_quantiles",
      "q137_returned_item_revenue", "q140_volume_shipping",
      "q141_suppliers_kept_waiting", "q143_order_priority_check",
      "q146_forecast_revenue", "q147_min_cost_supplier")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
