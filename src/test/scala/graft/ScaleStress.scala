package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, GraphOps, ScalableWindow}

/** 10x scale stress of the quadratic-sensitive paths — the growth-curve
  * proof behind the "would this survive a 100x scale-up" plan notes.
  *
  * The corpus is sf0.1 `documents` self-unioned k times with re-keyed ids
  * and PER-COPY TOKEN TAGGING (every token prefixed with the copy index):
  * gram sets are disjoint across copies, so the scaled corpus is "k times
  * more data of the same near-dup shape" — output and candidate structure
  * grow ~k, not the k-squared clique blowup a verbatim self-union would
  * manufacture (which would measure the DATA's quadratic pair count, not
  * the OPERATOR's scaling).
  *
  * Measured (this box, local[32], sf0.1 base = 5,000 docs, default 8g
  * driver heap), runtimes in seconds at k=1 vs k=10:
  * see dev/scale_stress_results.json — each ratio must stay under
  * MaxRatio = 10 x 1.25 (log factor headroom) x 2 (timing slack) = 25,
  * i.e. at-most-linearithmic growth, and the run completing at all is the
  * no-driver-OOM assertion.
  *
  * Dev-tier (not the driver gate): run with
  *   sbt "Test/runMain graft.ScaleStress"
  */
object ScaleStress {

  private val MaxRatio = 25.0

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0") // see Bench.scala
      .config("spark.sql.codegen.hugeMethodLimit", "8000") // see Bench.scala
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")

    // k disjoint-vocabulary copies: ids shifted, every token tagged c<i>
    def scaled(k: Int) = (0 until k).map { i =>
      base.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(lit(s"c$i"), regexp_replace(col("text"), "\\s+", s" c$i"))
          .as("text"))
    }.reduce(_ union _)

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def jac(k: Int): Long =
      DedupOps.jaccardPairs(scaled(k), w = 3, threshold = 0.5, maxDf = 64)
        .count()

    // CC input decoupled from jaccard: segmented path edges (64-node
    // segments — the shallow-cluster shape near-dup graphs have), nodes
    // scaling with k
    def ccEdges(k: Int) = spark.range(0, 40000L * k)
      .filter(col("id") % 64 =!= 63)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    def cc(k: Int): Long = GraphOps.connectedComponents(ccEdges(k)).count()

    def rn(k: Int): Long = {
      val h = scaled(k).select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("hk"))
      ScalableWindow.rowNumber(h, Seq("hk", "doc_id"), "ord")
        .agg(max("ord")).head().getLong(0)
    }

    // un-timed warmup: codegen + JIT compile outside the clock
    jac(1); cc(1); rn(1)

    val results = Seq[(String, Int => Long)](
      ("jaccardPairs", jac), ("connectedComponents", cc),
      ("rowNumber", rn)).map { case (name, f) =>
      val (t1, n1) = time(f(1))
      val (t10, n10) = time(f(10))
      val ratio = t10 / math.max(t1, 1e-9)
      println(f"[scale-stress] $name%-20s k=1: $t1%6.2fs ($n1 rows)  " +
        f"k=10: $t10%6.2fs ($n10 rows)  ratio ${ratio}%5.2f")
      (name, t1, n1, t10, n10, ratio)
    }

    val json = results.map { case (name, t1, n1, t10, n10, ratio) =>
      f"""{"op":"$name","t1_sec":$t1%.3f,"rows1":$n1,"t10_sec":$t10%.3f,"rows10":$n10,"ratio":$ratio%.2f}"""
    }.mkString("[", ",", "]")
    val out = java.nio.file.Paths.get("dev", "out")
    java.nio.file.Files.createDirectories(out)
    java.nio.file.Files.write(out.resolve("scale_stress.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[scale-stress] $json")

    val bad = results.filter(_._6 > MaxRatio)
    require(bad.isEmpty,
      s"super-linearithmic growth: ${bad.map(r => s"${r._1}=${r._6}").mkString(", ")}")
    println(s"[scale-stress] OK: all ratios <= $MaxRatio")
    spark.stop()
  }
}
