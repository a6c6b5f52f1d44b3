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

  test("histograms truncate at printLimit with an ellipsis marker") {
    // same FP fixture, printLimit=1: the FP-site histogram must show one
    // line + the cut marker, and the full report (limit default) must be
    // a superset — golden files stay valid because fixtures never reach
    // the default 1000-line limit
    val path = ReportFixtures.withDroppedTruth(BamFixture.tiny)
    val full = Reports.checkBamReport(spark, path, "eager")
    val capped = Reports.checkBamReport(spark, path, "eager", printLimit = 0)
    val histLines = (r: String) => r
      .split("\n").dropWhile(!_.startsWith("False-positive-site flags"))
      .drop(1).takeWhile(_.startsWith("\t"))
    assert(histLines(full).nonEmpty && !histLines(full).contains("\t…"), full)
    assert(histLines(capped).toSeq == Seq("\t…"), capped)

    // fullCheck's flag-count histograms use the same cap
    val cappedFull = Reports.fullCheckReport(spark, BamFixture.tiny.bamPath,
      printLimit = 0)
    assert(cappedFull.contains("\tHistogram:\n\t\t…\n"), cappedFull)
  }

  test("report header agrees with the fixture's block metadata") {
    val fx = BamFixture.tiny
    val report = Reports.fullCheckReport(spark, fx.bamPath)
    assert(report.startsWith(s"${fx.totalUncompressedPositions} uncompressed positions\n"))
    assert(report.contains(s"\n${fx.numRecords} reads\n"))
  }
}
