package graft.bam.ops

/** Scratch generator for the golden report files (run manually via
  * `Test/runMain graft.bam.ops.GenReports <outDir>`; the pinned outputs
  * live in src/test/resources/golden). */
object GenReports {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/golden"))
    java.nio.file.Files.createDirectories(out)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("gen-reports")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    val tiny = graft.bam.fixtures.BamFixture.tiny
    java.nio.file.Files.writeString(out.resolve("full-check-tiny.txt"),
      Reports.fullCheckReport(spark, tiny.bamPath))
    java.nio.file.Files.writeString(out.resolve("check-bam-relaxed-tiny.txt"),
      Reports.checkBamReport(spark, tiny.bamPath, "relaxed"))
    java.nio.file.Files.writeString(out.resolve("check-bam-fp.txt"),
      Reports.checkBamReport(spark, ReportFixtures.withDroppedTruth(tiny), "eager"))
    java.nio.file.Files.writeString(out.resolve("check-bam-eager-tiny.txt"),
      Reports.checkBamReport(spark, tiny.bamPath, "eager"))
    spark.stop()
  }
}
