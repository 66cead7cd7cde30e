package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the plan-quality audit
  * (predicate pushdown, column pruning, codegen spans, join strategies).
  * Output reviewed into BENCH/PLANS.md. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    def dump(name: String): Unit = {
      println(s"\n######## $name ########")
      // e04's registered query memoizes its result to parquet (shared
      // with the e06 audit) — explain the LIVE search pipeline, not the
      // read-back scan of the dump
      val df =
        if (name == "e04_ivf_topk") Queries.ivfTopK(spark, sf, dumpResult = false)
        else SparkEntry.queries(name)(spark, sf)
      df.explain("formatted")
    }
    Seq("q01_filter_project", "q02_agg_group", "q03_join_agg",
      "d02_ngram_jaccard", "d03_minhash_lsh_pairs", "d04_minhash_jaccard_dedup",
      "e02_embedding_pairs", "e03_embedding_lsh_pairs", "e04_ivf_topk",
      "d08_sql_jaccard", "q10_bucketed_join",
      "d13_repeated_ngram_spans", "d14_containment_dedup",
      "d15_sketch_error_audit", "t06_unigram_logprob",
      "t09_stratified_sample", "e06_ann_recall",
      "m07_clip_neardup_pairs", "m10_audio_neardup_pairs",
      "d16_decontaminate",
      "d17_decontaminate_bloom", "e07_semantic_dedup",
      "t12_doc_repetition", "e08_pq_adc_topk", "t13_cardinality_kmv",
      "q12_partition_pruned_scan", "q13_dpp_star_join").foreach(dump)
    spark.stop()
  }
}
