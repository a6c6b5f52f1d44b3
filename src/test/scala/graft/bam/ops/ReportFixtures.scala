package graft.bam.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.bam.fixtures.BamFixture

/** A fixture variant whose `.records` truth side-car is missing every 25th
  * record: the checker (correctly) calls those positions record starts, so
  * against the doctored truth they surface as FALSE POSITIVES — a
  * deterministic way to exercise the check-bam report's FP sections (the
  * reference's 1.bam golden has real checker FPs; our checkers are
  * differential-zero on the generated fixtures). */
object ReportFixtures {

  @volatile private var cached: String = _

  def withDroppedTruth(fx: BamFixture.Fixture): String = synchronized {
    if (cached != null) return cached
    val dir = Files.createTempDirectory("graft-fp-fixture")
    val bam = dir.resolve("doctored.bam")
    def copy(from: String, to: Path): Unit =
      Files.copy(Paths.get(from), to, StandardCopyOption.REPLACE_EXISTING)
    copy(fx.bamPath, bam)
    copy(fx.blocksPath, dir.resolve("doctored.bam.blocks"))
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(Paths.get(fx.recordsPath))).asScala
    val kept = lines.zipWithIndex.collect {
      case (l, i) if i % 25 != 0 => l
    }
    Files.write(dir.resolve("doctored.bam.records"),
      scala.jdk.CollectionConverters.SeqHasAsJava(kept.toSeq).asJava)
    cached = bam.toString
    cached
  }
}
