package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for the graph tier (the r15 verdict's item 2):
  * times the connected-components loop — and the full dedup_clusters
  * composition — on the sf0.1 jaccard pair graph, with a job counter,
  * so the lazy-vs-eager round cut can be adjudicated on clean numbers.
  * Not a test: `sbt "Test/runMain graft.DevGraphAB [sfDir] [reps]"`.
  * Flip GraphOps.cut's localCheckpoint eagerness between runs to A/B. */
object DevGraphAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .appName("dev-graph-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def timed(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      Thread.sleep(300)
      println(f"AB $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${jobs.get() - j0}%4d jobs")
    }
    (1 to reps).foreach { r =>
      println(s"--- rep $r ---")
      timed("jaccardPairs only") {
        graft.ops.DedupOps.jaccardPairs(docs, w = 3, threshold = 0.5,
          maxDf = 64).write.format("noop").mode("overwrite").save()
      }
      timed("CC only (pairs precomputed)") {
        val pairs = graft.ops.DedupOps.jaccardPairs(docs, w = 3,
          threshold = 0.5, maxDf = 64).localCheckpoint(true)
        val (cc, rounds) = graft.ops.GraphOps.connectedComponentsWithRounds(
          pairs, "id_a", "id_b")
        cc.write.format("noop").mode("overwrite").save()
        println(s"   rounds: $rounds")
        graft.ops.GraphOps.free(cc)
        pairs.unpersist()
      }
      timed("dedup_clusters end-to-end") {
        val pairs = graft.ops.DedupOps.jaccardPairs(docs, w = 3,
          threshold = 0.5, maxDf = 64)
        graft.ops.GraphOps.clusterAssign(docs, "doc_id", pairs)
          .write.format("noop").mode("overwrite").save()
      }
      // between-reps hygiene (the Bench pattern)
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc(); Thread.sleep(200)
    }
    s.stop()
  }
}
