package graft

import org.apache.spark.sql.SparkSession

import graft.bam.fixtures.BamFixture
import graft.bam.ops.SplitReports

/** Dev tool: regenerate the golden report files for the split/throughput
  * CLI subcommands from the deterministic tiny fixture. Timing values are
  * replaced with the `<NUM>` placeholder CliMainSpec's line matcher
  * understands (the reference's `l"...: ${d}ms"` idiom). Run:
  * `sbt "Test/runMain graft.GoldenGen"` — writes into
  * src/test/resources/golden/.
  */
object GoldenGen {

  private val TimingLine =
    "^((?:Get (?:eager|relaxed) splits: )|(?:eager|relaxed) (?:read-count|first-read collection) time: )\\d+(ms)?$".r

  def maskTimings(report: String): String =
    report.split("\n", -1).map { line =>
      TimingLine.findFirstMatchIn(line) match {
        case Some(m) => s"${m.group(1)}<NUM>${Option(m.group(2)).getOrElse("")}"
        case None => line
      }
    }.mkString("\n")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fx = BamFixture.tiny
    val dir = java.nio.file.Paths.get("src/test/resources/golden")
    def write(name: String, text: String): Unit = {
      java.nio.file.Files.writeString(dir.resolve(name), maskTimings(text))
      println(s"== $name\n${maskTimings(text)}")
    }
    write("compute-splits-eager-tiny.txt",
      SplitReports.computeSplitsReport(fx.bamPath, 1024, eagerOnly = true))
    write("compute-splits-relaxed-tiny.txt",
      SplitReports.computeSplitsReport(fx.bamPath, 1024, relaxedOnly = true))
    write("compute-splits-compare-tiny.txt",
      SplitReports.computeSplitsReport(fx.bamPath, 1024))
    write("count-reads-tiny.txt",
      SplitReports.countReadsReport(spark, fx.bamPath, 1024))
    write("time-load-tiny.txt",
      SplitReports.timeLoadReport(spark, fx.bamPath, 1024))
    write("check-blocks-tiny.txt",
      SplitReports.checkBlocksReport(spark, fx.bamPath))
    spark.stop()
  }
}
