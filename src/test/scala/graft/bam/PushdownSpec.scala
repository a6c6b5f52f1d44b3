package graft.bam

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture
import org.apache.spark.sql.functions._

/** Genomic-index partition pruning: pushed contig/pos predicates must
  * shrink planInputPartitions while residual filters keep results exact. */
class PushdownSpec extends SparkTestBase {

  private lazy val fx = BamFixture.default

  private def load() = spark.read.format("bam")
    .option("splitSize", "16384").load(fx.bamPath)

  test("refIdx+pos predicate prunes partitions and keeps results exact") {
    val full = load()
    val fullParts = full.rdd.getNumPartitions
    val q = load().filter(col("refIdx") === 0 &&
      col("pos") >= 100000 && col("pos") < 200000)
    val qParts = q.rdd.getNumPartitions
    assert(qParts < fullParts, s"pruned $qParts vs full $fullParts")
    val want = fx.records.count(r =>
      r.refIdx == 0 && r.pos >= 100000 && r.pos < 200000)
    assert(q.count() == want)
  }

  test("contig equality prunes through the name->idx mapping") {
    val q = load().filter(col("contig") === "chr3" && col("pos") < 50000)
    val want = fx.records.count(r => r.refIdx == 2 && r.pos < 50000)
    assert(q.count() == want && want > 0)
    assert(q.rdd.getNumPartitions < load().rdd.getNumPartitions)
  }

  test("OR of intervals (the loadBamIntervals shape) stays exact") {
    val q = load().filter(
      (col("contig") === "chr1" && col("pos") < 100000) ||
        (col("contig") === "chr2" && col("pos").between(500000, 600000)))
    val want = fx.records.count(r =>
      (r.refIdx == 0 && r.pos < 100000) ||
        (r.refIdx == 1 && r.pos >= 500000 && r.pos <= 600000))
    assert(q.count() == want && want > 0)
  }

  test("unknown contig yields zero partitions and zero rows") {
    val q = load().filter(col("contig") === "chrNOPE")
    assert(q.count() == 0)
    assert(q.rdd.getNumPartitions == 0)
  }

  test("pushed filters appear in the scan description") {
    val q = load().filter(col("refIdx") === 1)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") || scan.contains("pushed="),
      s"plan should surface pushdown:\n$scan")
  }

  test("standard .bai alone prunes partitions and keeps results exact") {
    // a copy with NO .gri / .blocks / .records — only the freshly-built
    // standard BAI, the index every real-world sorted BAM ships with
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-bai")
    val copy = tmpDir.resolve("baionly.bam")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fx.bamPath), copy)
    graft.bam.ops.BamOps.indexBai(spark, copy.toString)
    assert(new java.io.File(copy.toString + ".bai").exists())

    def loadCopy() = spark.read.format("bam")
      .option("splitSize", "16384").load(copy.toString)
    val fullParts = loadCopy().rdd.getNumPartitions
    val q = loadCopy().filter(col("contig") === "chr3" && col("pos") < 50000)
    assert(q.rdd.getNumPartitions < fullParts,
      s"bai pruned ${q.rdd.getNumPartitions} vs full $fullParts")
    val want = fx.records.count(r => r.refIdx == 2 && r.pos < 50000)
    assert(q.count() == want && want > 0)

    // overlap-interval query (the loadBamIntervals shape) over BAI pruning
    val iv = loadCopy().filter(col("refIdx") === 0 &&
      col("pos") < 150000 && col("endPos") > 100000)
    val wantIv = fx.records.count(r =>
      r.refIdx == 0 && r.pos < 150000 && r.end > 100000)
    assert(iv.count() == wantIv && wantIv > 0)
  }

  test("bai round-trips through its binary codec") {
    import graft.bam.ds.Bai
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-bai-rt")
    val copy = tmpDir.resolve("rt.bam")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fx.bamPath), copy)
    graft.bam.ops.BamOps.indexBai(spark, copy.toString)
    val idx = Bai.read(copy.toString).get
    Bai.write(copy.toString, idx)
    assert(Bai.read(copy.toString).get == idx)
    // binning identities from the SAM spec
    assert(Bai.reg2bin(0, 1) == 4681)
    assert(Bai.reg2bin(0, 1 << 29) == 0)
    assert(Bai.reg2bins(0, 1 << 14) == Seq(0, 1, 9, 73, 585, 4681))
  }

  test("multi-path read over files with DIFFERENT contig orderings prunes " +
    "per-file and stays exact") {
    import graft.bam.codec.Bam
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-hetero")
    // same contig names, different dictionary ORDER: chr3 is idx 2 in A
    // but idx 0 in B — a directory of BAMs from different pipelines
    val fxA = BamFixture.write(tmpDir, "a.bam", n = 600, seed = 21,
      payloadSize = 2048)
    val fxB = BamFixture.write(tmpDir, "b.bam", n = 600, seed = 22,
      payloadSize = 2048,
      contigs = IndexedSeq(Bam.Contig("chr3", 900_000),
        Bam.Contig("chr1", 2_000_000), Bam.Contig("chr2", 1_500_000)))

    def both() = spark.read.format("bam")
      .option("splitSize", "4096")
      .option("paths", s"${fxA.bamPath},${fxB.bamPath}").load()

    val fullParts = both().rdd.getNumPartitions
    val q = both().filter(col("contig") === "chr3" && col("pos") < 50000)
    val want =
      fxA.records.count(r => r.refIdx == 2 && r.pos < 50000) +
        fxB.records.count(r => r.refIdx == 0 && r.pos < 50000)
    assert(q.count() == want && want > 0)
    assert(q.rdd.getNumPartitions < fullParts,
      s"pruned ${q.rdd.getNumPartitions} vs full $fullParts")

    // refIdx filters are dictionary-RELATIVE: idx 0 means chr1 in A but
    // chr3 in B; the scan must honor each file's own dictionary
    val byIdx = both().filter(col("refIdx") === 0 && col("pos") < 50000)
    val wantIdx =
      fxA.records.count(r => r.refIdx == 0 && r.pos < 50000) +
        fxB.records.count(r => r.refIdx == 0 && r.pos < 50000)
    assert(byIdx.count() == wantIdx && wantIdx > 0)

    // a contig present in only ONE file: only that file's rows survive
    val onlyB = BamFixture.write(tmpDir, "c.bam", n = 300, seed = 23,
      payloadSize = 2048,
      contigs = IndexedSeq(Bam.Contig("chrX", 700_000)))
    val mixed = spark.read.format("bam")
      .option("splitSize", "4096")
      .option("paths", s"${fxA.bamPath},${onlyB.bamPath}").load()
      .filter(col("contig") === "chrX")
    assert(mixed.count() == onlyB.records.count(_.refIdx == 0))
  }

  test("indexGenomic rebuilds an equivalent index from the source") {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-gri")
    val copy = tmpDir.resolve("copy.bam")
    java.nio.file.Files.copy(java.nio.file.Paths.get(fx.bamPath), copy)
    graft.bam.ops.BamOps.indexGenomic(spark, copy.toString)
    val rebuilt = graft.bam.ds.GenomicIndex.read(copy.toString).get
      .sortBy(_.start)
    val original = graft.bam.ds.GenomicIndex.read(fx.bamPath).get
      .sortBy(_.start)
    assert(rebuilt == original)
  }
}
