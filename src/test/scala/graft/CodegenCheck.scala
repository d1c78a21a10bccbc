package graft
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = LocalSessions.builder(8, 8)
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("dd_minhash", "dd_simhash", "dd_ngram_jaccard",
        "dd_embedding_neardups", "sim_cosine_topk", "sim_lsh_topk",
        "sim_ivf_topk", "ts_langid_scores", "ts_repetition",
        "ts_clean_corpus", "j12_bloom_prune_join",
        "dd_repeated_ngram_scrub", "dd_incremental_minhash",
        "ts_bpe_encode", "ts_nb_filter")) {
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      println(s"CODEGEN_OK $q")
    }
    spark.stop()
  }
}
