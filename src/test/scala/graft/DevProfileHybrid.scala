package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the hybrid_rrf gate query (the r13
  * verdict #2 item; accounting in docs/plans.md "round 14"). Includes
  * a per-box calibration pair — a trivial codegen'd 10M-row aggregate
  * and a bare 2.7M-row shuffle+agg — so the gate's cpu numbers can be
  * read relative to what THIS box charges for known work. Not a test:
  * `sbt "Test/runMain graft.DevProfileHybrid [sfDir]"`. */
object DevProfileHybrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("PROF_HUGE", "8000")) // match the bench JVM
      .appName("dev-profile-hybrid").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.ops.{DedupOps, InvertedIndexOps, RetrievalOps, SimilarityOps}

    def cpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1e9
        case _ => 0.0
      }
    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val c0 = cpuSec()
      val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s wall ${cpuSec() - c0}%8.2f s cpu")
      r
    }

    (1 to 2).foreach { _ =>
      stage("calib range10M agg") {
        s.range(10000000L).groupBy(pmod(col("id"), lit(1000)))
          .agg(sum("id")).write.format("noop").mode("overwrite").save()
      }
      stage("calib shuffle 2.7M") {
        s.range(2700000L)
          .select(pmod(col("id"), lit(100)).as("q"),
            pmod(col("id"), lit(5000)).as("d"),
            (col("id") % 97).cast("double").as("c"))
          .repartition(col("q"), col("d"))
          .groupBy("q", "d").agg(sum("c"))
          .write.format("noop").mode("overwrite").save()
      }
    }

    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("hybrid-prof").toString

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val tbl = s"hyb_prof_$round"
      stage("writeScoredIndex") {
        InvertedIndexOps.writeScoredIndex(docs, s, tbl, s"$base/$round")
      }
      val snips = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id"),
          slice(DedupOps.tokens(col("text")), 1, 8).as("t8"))
      val bm = stage("searchBm25Batch") {
        val r = InvertedIndexOps.searchBm25Batch(
          snips.select(col("doc_id").as("query_id"), col("t8").as("terms")),
          s, tbl, topK = 10)
          .select("query_id", "doc_id", "rank")
        r.write.format("noop").mode("overwrite").save(); r
      }
      val emb = stage("hashEmbedMd5(corpus)") {
        val e = SimilarityOps.hashEmbedMd5(docs, dim = 16)
        e.write.format("noop").mode("overwrite").save(); e
      }
      val qemb = stage("hashEmbedMd5(snips)") {
        val e = SimilarityOps.hashEmbedMd5(
          snips.select(col("doc_id"), array_join(col("t8"), " ").as("text")),
          dim = 16)
        e.write.format("noop").mode("overwrite").save(); e
      }
      val dense = stage("bruteForceTopK") {
        val d = SimilarityOps.bruteForceTopK(qemb, emb, k = 10,
          idCol = "doc_id")
          .select(col("query_id"), col("item_id").as("doc_id"),
            col("rank").cast("long").as("rank"))
        d.write.format("noop").mode("overwrite").save(); d
      }
      stage("rrfFuse+full") {
        RetrievalOps.rrfFuse(Seq(bm, dense), topK = 10)
          .orderBy("query_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
      stage("END-TO-END (as the gate runs it)") {
        val bm2 = InvertedIndexOps.searchBm25Batch(
          snips.select(col("doc_id").as("query_id"), col("t8").as("terms")),
          s, tbl, topK = 10)
          .select("query_id", "doc_id", "rank")
        val emb2 = SimilarityOps.hashEmbedMd5(docs, dim = 16)
        val qemb2 = SimilarityOps.hashEmbedMd5(
          snips.select(col("doc_id"), array_join(col("t8"), " ").as("text")),
          dim = 16)
        val dense2 = SimilarityOps.bruteForceTopK(qemb2, emb2, k = 10,
          idCol = "doc_id")
          .select(col("query_id"), col("item_id").as("doc_id"),
            col("rank").cast("long").as("rank"))
        RetrievalOps.rrfFuse(Seq(bm2, dense2), topK = 10)
          .orderBy("query_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
