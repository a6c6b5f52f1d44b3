package graft

import org.apache.spark.sql.functions._

/** Scratch: probe fixture params for BAI multi-chunk fragmentation. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("scratch2")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.bam.ds.{Bai, GenomicIndex}
    for ((n, ps) <- Seq((4000, 1024), (12000, 512), (20000, 512))) {
      val tmpDir = java.nio.file.Files.createTempDirectory("graft-dbg")
      val frag = graft.bam.fixtures.BamFixture.write(tmpDir, "frag.bam",
        n = n, seed = 31, payloadSize = ps)
      graft.bam.ops.BamOps.indexBai(spark, frag.bamPath)
      val idx = Bai.read(frag.bamPath).get
      val multi = for {
        (r, ref) <- idx.refs.zipWithIndex
        (bin, cs) <- r.bins if cs.length > 1
      } yield (ref, bin, cs.length)
      val byLevel = multi.groupBy { case (_, b, _) =>
        if (b >= 4681) 14 else if (b >= 585) 17 else if (b >= 73) 20
        else if (b >= 9) 23 else 26
      }.view.mapValues(_.size).toMap
      def binRange(bin: Int): (Int, Int) =
        if (bin >= 4681) ((bin - 4681) << 14, ((bin - 4681) + 1) << 14)
        else if (bin >= 585) ((bin - 585) << 17, ((bin - 585) + 1) << 17)
        else if (bin >= 73) ((bin - 73) << 20, ((bin - 73) + 1) << 20)
        else if (bin >= 9) ((bin - 9) << 23, ((bin - 9) + 1) << 23)
        else if (bin >= 1) ((bin - 1) << 26, (bin - 1 + 1) << 26)
        else (0, Bai.MaxCoord)
      val merged = Bai.Index(idx.refs.map(r => r.copy(bins = r.bins.map {
        case (b, cs) =>
          b -> IndexedSeq(Bai.Chunk(cs.map(_.beg).min, cs.map(_.end).max))
      })))
      def pruned(i: Bai.Index, ref: Int, lo: Int, hi: Int): Long =
        Bai.pruneRanges(i, Seq(GenomicIndex.GBound(Some(ref), lo, hi)),
            Long.MaxValue).get.map { case (s, e) => e - s }.sum
      val strict = multi.map { case (ref, bin, _) =>
        val (lo, hi) = binRange(bin)
        val q = (lo, math.min(hi, lo + (1 << 14)))
        pruned(idx, ref, q._1, q._2) < pruned(merged, ref, q._1, q._2)
      }
      println(s"n=$n ps=$ps multiBins=${multi.size} byLevel=$byLevel " +
        s"strictQueries=${strict.count(identity)}/${strict.size}")
    }
    spark.stop()
  }
}
