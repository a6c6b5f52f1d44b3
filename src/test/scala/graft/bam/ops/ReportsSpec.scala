package graft.bam.ops

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture

/** Golden-file parity for the CLI report renderers: the full report text
  * (header stats, verdict, flag sections, per-flag tables) is pinned
  * byte-for-byte, the way the reference pins
  * cli/src/test/resources/output/check-bam and …/full-check. */
class ReportsSpec extends SparkTestBase {

  private def golden(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource(s"/golden/$name").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("full-check report matches the golden file") {
    val actual = Reports.fullCheckReport(spark, BamFixture.tiny.bamPath)
    assert(actual == golden("full-check-tiny.txt"))
  }

  test("check-bam report, all matched, matches the golden file") {
    val actual = Reports.checkBamReport(spark, BamFixture.tiny.bamPath, "eager")
    assert(actual == golden("check-bam-eager-tiny.txt"))
  }

  test("check-bam report with false positives matches the golden file") {
    val path = ReportFixtures.withDroppedTruth(BamFixture.tiny)
    val actual = Reports.checkBamReport(spark, path, "eager")
    assert(actual == golden("check-bam-fp.txt"))
  }

  test("report header agrees with the fixture's block metadata") {
    val fx = BamFixture.tiny
    val report = Reports.fullCheckReport(spark, fx.bamPath)
    assert(report.startsWith(s"${fx.totalUncompressedPositions} uncompressed positions\n"))
    assert(report.contains(s"\n${fx.numRecords} reads\n"))
  }
}
