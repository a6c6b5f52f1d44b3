package graft.bam

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture

/** Partial/truncated-file behavior: by default the scan degrades
  * gracefully to the records of the complete blocks; with
  * `strictEof=true` a missing BGZF terminator fails at PLAN time (the
  * posture a 100 TB ingest wants against in-flight or corrupt files). */
class TruncationSpec extends SparkTestBase {

  private lazy val truncated: String = {
    val fx = BamFixture.tiny
    val all = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fx.bamPath))
    val cut = java.util.Arrays.copyOf(all, (all.length * 0.6).toInt)
    val p = java.nio.file.Files.createTempDirectory("graft-trunc")
      .resolve("truncated.bam")
    java.nio.file.Files.write(p, cut)
    p.toString
  }

  test("default scan returns the complete blocks' records, nothing bogus") {
    val fx = BamFixture.tiny
    val rows = spark.read.format("bam").option("splitSize", "8192")
      .load(truncated)
      .select("readName").collect().map(_.getString(0)).toSet
    assert(rows.nonEmpty && rows.size < fx.numRecords)
    // every decoded read is a real fixture read (no garbage at the cut)
    val real = fx.records.map(_.readName).toSet
    assert(rows.subsetOf(real))
  }

  test("CRAM paths are rejected at plan time with the documented stance") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("bam").load("/tmp/whatever.cram").count()
    }
    assert(e.getMessage.contains("CRAM is not supported"))
  }

  test("strictEof fails loudly on a truncated file, passes on a whole one") {
    val e = intercept[IllegalStateException] {
      spark.read.format("bam").option("strictEof", "true")
        .load(truncated).count()
    }
    assert(e.getMessage.contains("EOF marker"))
    val n = spark.read.format("bam").option("strictEof", "true")
      .load(BamFixture.tiny.bamPath).count()
    assert(n == BamFixture.tiny.numRecords)
  }
}
