package graft

/** Scratch: dump executed plans of flagship queries for docs/plans.md
  * (`Test/runMain graft.DumpPlans <out>`). */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val out = new StringBuilder
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("plans")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.locality.wait", "0")
      .config("spark.sql.codegen.hugeMethodLimit", "8000") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Seq("q1_agg", "a15_prefix_sum", "j5_lag_prev", "dedup_minhash",
      "dedup_jaccard", "dedup_emblsh", "ann_ivf", "bam_check_blocks",
      "p2_interval_filter", "pack_sequences", "sample_per_source",
      "emb_centroids", "tfidf_terms", "ev_spike",
      "ev_hdr_quantile",
      // r12 flagships: fused rank family (one WindowExec, bucket-keyed),
      // bm25 (bucket-pruned postings scan), pq ADC (codes-only corpus
      // pass), perceptual clip dedup (df-guarded equi-join)
      "w6_rank_family", "text_bm25", "ann_pq_adc",
      "mm_vdup_pairs",
      // r13 flagships: ledger-visibility + tombstone-filtered bm25 over
      // a deleted+rebuilt index, trained-PQ oracle cycle, banded
      // hamming near-miss image dedup, hybrid sparse+dense RRF fusion,
      // cluster-balanced subsampling
      "text_bm25_del", "ann_pq_train_q", "mm_dhash_near",
      "hybrid_rrf", "emb_cluster_sample").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      out ++= s"## $name\n\n```\n"
      out ++= df.queryExecution.executedPlan.toString.take(4000)
      out ++= "\n```\n\n"
    }
    // one alternating-CC round (large-star then small-star) over the
    // jaccard pair graph: the loop body of GraphOps.connectedComponents
    locally {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val pairs = graft.ops.DedupOps
        .jaccardPairs(docs, w = 3, threshold = 0.5, maxDf = 64)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .localCheckpoint(true)
      val round = graft.ops.GraphOps.oneRoundForPlanAudit(pairs)
      round.collect()
      out ++= "## dedup_clusters (one large-star + small-star round)\n\n```\n"
      out ++= round.queryExecution.executedPlan.toString.take(4000)
      out ++= "\n```\n\n"
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/plans.md")),
      out.result())
    spark.stop()
  }
}
