package graft

/** Scratch probe (not a test): time a few queries warm and dump final plans.
  * `Test/runMain graft.Scratch q1 q2 ...` */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.locality.wait", sys.env.getOrElse("LOCALITY_WAIT", "3s"))
      .config("spark.sql.codegen.hugeMethodLimit", "8000") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("j5_lag_prev", "w4_rownum_range")
    names.foreach { name =>
      val mk = () => SparkEntry.queries(name)(spark, dir)
      // bench-identical warmup: once at sf0.001 through the noop sink
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"== $name%-20s run$i $sec%.3f s")
      }
      // collect first so the print shows the FINAL adaptive plan (stage
      // reuse and AQE decisions included), not the pre-execution sketch
      val fin = mk(); fin.collect()
      println(fin.queryExecution.executedPlan.toString.take(20000))
    }
    spark.stop()
  }
}
