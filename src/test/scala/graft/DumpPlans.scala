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
      "p2_interval_filter").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      out ++= s"## $name\n\n```\n"
      out ++= df.queryExecution.executedPlan.toString.take(4000)
      out ++= "\n```\n\n"
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/plans.md")),
      out.result())
    spark.stop()
  }
}
