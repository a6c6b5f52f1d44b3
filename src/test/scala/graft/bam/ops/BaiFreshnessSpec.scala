package graft.bam.ops

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkTestBase}

/** Freshness contract of the per-JVM `.bai` fixture copies: a stale or
  * corrupt index left on disk by a PREVIOUS JVM (whose fixture generator or
  * BAI builder may have differed) must never be reused — the first access
  * of a JVM re-copies the BAM and rebuilds the index. Simulated here by
  * corrupting the side-car and dropping the memos (the only per-JVM state).
  */
class BaiFreshnessSpec extends SparkTestBase {

  private def runLong() =
    SparkEntry.queries("bam_longread_intervals")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

  test("stale on-disk .bai is rebuilt, not reused, after fixture regen") {
    val baseline = runLong()
    assert(baseline.nonEmpty)
    // locate the copy the query used and vandalize its index: a truncated/
    // garbage BAI from an "old JVM" that a Files.exists fast path would trust
    val dir = Paths.get(sys.props.getOrElse("graft.fixture.dir", "target/bam-fixtures"))
    val bai = dir.resolve("longread-baionly.bam.bai")
    assert(Files.exists(bai), "query should have built the side-car")
    Files.write(bai, Array.fill[Byte](64)(0x5a))
    BamQueries.resetBaiMemos() // next access behaves like a fresh JVM
    val again = runLong()
    assert(again.toSeq == baseline.toSeq,
      "fresh-JVM access must rebuild the corrupt BAI and return identical rows")
    // and the rebuilt index is a real BAI again, not the 64-byte garbage
    assert(Files.size(bai) > 64, "BAI was not rebuilt")
  }
}
