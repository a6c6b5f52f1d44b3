package graft

import graft.bam.fixtures.BamFixture

/** The CLI front-end must be a pure mapping onto the library functions:
  * `check-bam` reproduces ReportsSpec's golden text byte-for-byte, and the
  * table-shaped subcommands agree with their underlying queries. (Under
  * the shared test session, Main's getOrCreate reuses it.) */
class CliMainSpec extends SparkTestBase {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-cli").resolve(name).toString

  private def golden(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource(s"/golden/$name").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Reference line-matcher idiom (ComputeSplitsTest.scala:15-70): every
    * line byte-pinned except `<NUM>` placeholders, which match any number
    * (timing values). */
  private def assertGoldenLines(actual: String, goldenName: String): Unit = {
    val got = actual.split("\n", -1)
    val want = golden(goldenName).split("\n", -1)
    assert(got.length == want.length,
      s"line count ${got.length} != ${want.length} in $goldenName:\n$actual")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      if (w.contains("<NUM>")) {
        val re = java.util.regex.Pattern.quote(w)
          .replace("<NUM>", "\\E\\d+(?:\\.\\d+)?\\Q").r
        assert(re.matches(g), s"line ${i + 1} of $goldenName: '$g' !~ '$w'")
      } else assert(g == w, s"line ${i + 1} of $goldenName: '$g' != '$w'")
    }
  }

  private def runToString(args: Seq[String]): String = {
    val out = tmp("report.txt")
    Main.runArgs(args ++ Seq("-o", out))
    java.nio.file.Files.readString(java.nio.file.Paths.get(out))
  }

  test("check-bam subcommand reproduces the golden report") {
    val out = tmp("check-bam.txt")
    Main.runArgs(Seq("check-bam", "--checker", "eager", "-o", out,
      BamFixture.tiny.bamPath))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(out)) ==
      golden("check-bam-eager-tiny.txt"))
  }

  test("full-check subcommand reproduces the golden report") {
    val out = tmp("full-check.txt")
    Main.runArgs(Seq("full-check", "-o", out, BamFixture.tiny.bamPath))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(out)) ==
      golden("full-check-tiny.txt"))
  }

  test("count-reads --tsv agrees with the bam source count") {
    val out = tmp("counts.tsv")
    val fx = BamFixture.tiny
    Main.runArgs(Seq("count-reads", "--tsv", "-o", out, fx.bamPath))
    val lines = java.nio.file.Files.readString(java.nio.file.Paths.get(out))
      .trim.split("\n")
    assert(lines.toSeq == Seq(s"${fx.bamPath}\t${fx.numRecords}"))
  }

  test("compute-splits -s reproduces the golden eager report") {
    assertGoldenLines(
      runToString(Seq("compute-splits", "-s", "--split-size", "1024",
        BamFixture.tiny.bamPath)),
      "compute-splits-eager-tiny.txt")
  }

  test("compute-splits -u reproduces the golden relaxed report") {
    assertGoldenLines(
      runToString(Seq("compute-splits", "-u", "--split-size", "1024",
        BamFixture.tiny.bamPath)),
      "compute-splits-relaxed-tiny.txt")
  }

  test("compute-splits compare mode reproduces the golden diff report") {
    assertGoldenLines(
      runToString(Seq("compute-splits", "--split-size", "1024",
        BamFixture.tiny.bamPath)),
      "compute-splits-compare-tiny.txt")
  }

  test("count-reads -n emits per-profile timing Stats and the unanimous verdict") {
    val report = runToString(Seq("count-reads", "-n", "3", "--split-size", "1024",
      BamFixture.tiny.bamPath))
    assert(report.contains("eager times (ms):\nN: 3,"), report)
    assert(report.contains("relaxed times (ms):\nN: 3,"), report)
    assert(report.contains(s"Read counts matched: ${BamFixture.tiny.numRecords}"), report)
  }

  test("compute-splits -p appends deterministic partition count stats") {
    val report = runToString(Seq("compute-splits", "-s", "-p",
      "--split-size", "1024", BamFixture.tiny.bamPath))
    val idx = report.indexOf("Partition count stats:\n")
    assert(idx > 0, report)
    // 16 splits, 120 records: the stats header over per-split record
    // counts is fully deterministic (timing plays no part)
    val stats = report.substring(idx)
    assert(stats.startsWith("Partition count stats:\nN: 16,"), stats)
  }

  test("count-reads reproduces the golden race report") {
    assertGoldenLines(
      runToString(Seq("count-reads", "--split-size", "1024",
        BamFixture.tiny.bamPath)),
      "count-reads-tiny.txt")
  }

  test("time-load reproduces the golden report") {
    assertGoldenLines(
      runToString(Seq("time-load", "--split-size", "1024",
        BamFixture.tiny.bamPath)),
      "time-load-tiny.txt")
  }

  test("check-blocks reproduces the golden report") {
    assertGoldenLines(
      runToString(Seq("check-blocks", BamFixture.tiny.bamPath)),
      "check-blocks-tiny.txt")
  }

  test("compare-splits subcommand emits the timing report shape") {
    val sw = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(sw)) {
      Main.runArgs(Seq("compare-splits", "--split-size", "65536",
        BamFixture.tiny.bamPath))
    }
    val report = sw.toString
    assert(report.contains("BAMs' splits"), report)
    assert(report.contains("Total split-computation time:"), report)
  }

  test("htsjdk-rewrite subcommand round-trips a record range") {
    val out = tmp("slice.bam")
    Main.runArgs(Seq("htsjdk-rewrite", "--range", "0:100",
      BamFixture.tiny.bamPath, out))
    assert(spark.read.format("bam").load(out).count() == 100)
  }

  test("unknown command raises the usage error") {
    intercept[IllegalArgumentException] {
      Main.runArgs(Seq("not-a-command"))
    }
  }
}
