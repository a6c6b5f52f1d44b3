package graft.bam

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture
import org.apache.spark.sql.functions._

/** Throughput evidence on the ~50 MB streamed fixture: the scan must be
  * exact at volume (no boundary dup/drop across ~900 blocks) and its
  * per-byte rate must beat the setup-dominated small fixture — i.e. the
  * source's cost scales with bytes, not with file count. */
class BamThroughputSpec extends SparkTestBase {

  private def scanCount(path: String): Long =
    spark.read.format("bam").option("splitSize", (2L << 20).toString)
      .load(path).count()

  test("the 50 MB fixture scans exactly, at a higher per-byte rate") {
    val bigPath = BamFixture.bigPath
    val smallPath = BamFixture.default.bamPath
    val bigBytes = new java.io.File(bigPath).length()
    val smallBytes = new java.io.File(smallPath).length()
    assert(bigBytes >= (40L << 20),
      s"big fixture is ${bigBytes >> 20} MB; expected >= 40 MB")

    // warm both paths once (codegen + FS metadata), then measure
    scanCount(smallPath); scanCount(bigPath)
    def rate(path: String, bytes: Long): Double = {
      val t0 = System.nanoTime()
      scanCount(path)
      bytes / ((System.nanoTime() - t0) / 1e9) / (1 << 20)
    }
    val smallRate = rate(smallPath, smallBytes)
    val bigRate = rate(bigPath, bigBytes)
    info(f"small fixture: $smallRate%.1f MB/s, big fixture: $bigRate%.1f MB/s")
    assert(bigRate > smallRate,
      f"per-byte rate must improve with volume: big $bigRate%.1f <= small $smallRate%.1f MB/s")

    // exactness at volume: every generated record, no boundary dup/drop
    assert(scanCount(bigPath) == BamFixture.BigRecords)
  }

  test("split-size sweep returns identical counts on the big fixture") {
    val path = BamFixture.bigPath
    val counts = Seq(1L << 20, 4L << 20, 16L << 20).map { ss =>
      spark.read.format("bam").option("splitSize", ss.toString)
        .load(path).count()
    }
    assert(counts.distinct.size == 1, counts.toString)
    assert(counts.head == BamFixture.BigRecords)
  }
}
