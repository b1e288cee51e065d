package graft
import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for headline queries — used to audit
  * pushdown, broadcast choice and codegen span width (SURVEY §4 posture).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE",
      "q02_filtered_revenue,q05_regional_revenue,j5_dim_join_revenue,v2_knn_top10," +
        "w7_topk_orders,v8_topk_multiprobe,d2_minhash_pairs,d8_neardup_survivors," +
        "v9_lsh_ann_recall,s13_binary_decode,d7_winnow_pairs,v10_quantized_recall," +
        "aj1_asof_join,dc1_decontam,d9_dup_spans,t6_repetition_metrics," +
        "rj1_range_join,sp1_sequence_pack,sp5_greedy_pack,sp2_balanced_sample," +
        "j9_bloom_semi,v11_pq_recall,t8_html_strip," +
        "t10_dsir_weights,sp6_domain_mix,k7_partitioned_upsert," +
        "d11_paragraph_dedup,d12_incremental_ingest,p3_corpus_build,t11_unigram_ppl," +
        "t12_corpus_profile,c9_cdc_chunks,sp7_epoch_shuffle,sp8_grouped_split," +
        "d13_corpus_overlap,sp9_token_budget,r1_bm25_topk,r2_hybrid_rrf," +
        "m1_multimodal_features,m4_media_frames,s14_pdf_split,v12_filtered_ann," +
        "d4_jaccard_verified,d15_incremental_neardup,w8_admin_page," +
        "d17_substring_spans,dc2_decontam_spans,m5_phash_dedup," +
        "m10_video_frames,m11_video_neardup,m13_mp4_keyframes," +
        "t13_bigram_ppl,t14_filter_config,sp10_export_shards,v13_ivfpq_recall," +
        "r3_mmr_rerank,k9_zorder_layout,v15_batch_ann,m15_audio_samples," +
        "m16_mp4_vfr,m14_mixed_media,dc3_semantic_decontam,sp12_tar_export," +
        "v16_pq_batch,st5_stream_join,dc4_decontam_pruned,m17_avcc_probe," +
        "m18_nal_units")
      .split(",")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
