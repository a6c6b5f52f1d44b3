package graft.bam.ops

import org.apache.spark.sql.functions._

import graft.bam.fixtures.BamFixture
import graft.queries.Q

/** SURVEY.md §2.1/§2.10/§2.11 coverage: the BAM-source operator set as
  * registered queries. These run on generated deterministic fixtures (the
  * reference's binary test files can't ship; FIXTURES.md), so they carry no
  * DuckDB oracle — the driver records rows-only checks and the exact-value
  * assertions live in [[graft.bam]] ScalaTest suites.
  */
object BamQueries {

  private def q(name: String)(run: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Q =
    Q(name, run, None)

  /** Copy `srcBam` next to nothing but a freshly built standard `.bai` —
    * none of the engine side-cars. ALWAYS re-copies and re-indexes on the
    * first call of a JVM (both inputs are deterministic and tiny): a
    * `Files.exists` fast path would silently reuse a stale artifact from a
    * previous JVM run after the fixture generator or BAI builder changed.
    * The per-JVM memo still amortizes repeat calls within one run. */
  private def freshBaiCopy(s: org.apache.spark.sql.SparkSession,
                           memo: java.util.concurrent.atomic.AtomicReference[String],
                           name: String, srcBam: String): String = synchronized {
    Option(memo.get).getOrElse {
      val dir = java.nio.file.Paths.get(
        sys.props.getOrElse("graft.fixture.dir", "target/bam-fixtures"))
      java.nio.file.Files.createDirectories(dir)
      val p = dir.resolve(name)
      java.nio.file.Files.copy(java.nio.file.Paths.get(srcBam), p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(p.toString + ".bai"))
      BamOps.indexBai(s, p.toString)
      memo.set(p.toString)
      p.toString
    }
  }

  /** A copy of the default fixture carrying ONLY a standard `.bai`. */
  private val baiOnlyMemo = new java.util.concurrent.atomic.AtomicReference[String]()
  private def baiOnly(s: org.apache.spark.sql.SparkSession): String =
    freshBaiCopy(s, baiOnlyMemo, "baionly.bam", BamFixture.default.bamPath)

  /** Long-read fixture copy carrying ONLY a standard `.bai` (same shape as
    * [[baiOnly]]), built once per JVM (Bench's un-timed warmup). */
  private val longBaiMemo = new java.util.concurrent.atomic.AtomicReference[String]()
  private def longReadBai(s: org.apache.spark.sql.SparkSession): String =
    freshBaiCopy(s, longBaiMemo, "longread-baionly.bam", BamFixture.longRead.bamPath)

  /** Test hook: drop the per-JVM bai-copy memos, simulating a fresh JVM —
    * the next access must re-copy and re-index even if stale artifacts sit
    * on disk (the freshness contract [[freshBaiCopy]] documents). */
  private[ops] def resetBaiMemos(): Unit = {
    baiOnlyMemo.set(null); longBaiMemo.set(null)
  }

  /** Two fixtures with DIFFERENT contig dictionaries (same names, different
    * order) — the heterogeneous multi-file read every mixed-pipeline BAM
    * directory hits. Built once per JVM (Bench's un-timed warmup). */
  private lazy val hetero: (String, String) = {
    import graft.bam.codec.Bam
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("graft.fixture.dir", "target/bam-fixtures"),
      "hetero")
    val fxA = BamFixture.write(dir, "a.bam", n = 600, seed = 21,
      payloadSize = 2048)
    val fxB = BamFixture.write(dir, "b.bam", n = 600, seed = 22,
      payloadSize = 2048,
      contigs = IndexedSeq(Bam.Contig("chr3", 900_000),
        Bam.Contig("chr1", 2_000_000), Bam.Contig("chr2", 1_500_000)))
    (fxA.bamPath, fxB.bamPath)
  }

  val all: Seq[Q] = Seq(
    // S5/P2 over a DIRECTORY of BAMs whose headers carry DIFFERENT contig
    // dictionaries: the pushed interval filter must resolve contig→idx per
    // file (pushFilters classifies supportedness against every path's
    // dictionary and pushes the intersection; pruning re-derives bounds
    // per file). Values pinned in PushdownSpec's two-dictionary case.
    q("bam_multi_dict") { (s, _) =>
      val (a, b) = hetero
      s.read.format("bam").option("splitSize", "4096")
        .option("paths", s"$a,$b").load()
        .filter(col("contig") === "chr3" && col("pos") < 50_000)
        .groupBy("contig").agg(count(lit(1)).as("n"),
          min("pos").as("first_pos"), max("pos").as("last_pos"))
        .orderBy("contig")
    },

    // S1/S2 loadBam + A1/A14 count-reads: per-contig record counts.
    q("bam_count_reads") { (s, _) =>
      s.read.format("bam").option("splitSize", "32768")
        .load(BamFixture.default.bamPath)
        .groupBy("refIdx", "contig").agg(count(lit(1)).as("n"))
        .orderBy("refIdx")
    },

    // Throughput evidence: the same count-reads over the ~50 MB streamed
    // fixture — enough bytes that the number measures scanning, not
    // setup. 2 MiB splits ≈ 28-way parallel scan. (The fixture itself is
    // materialized in Bench's un-timed warmup.)
    q("bam_count_big") { (s, _) =>
      s.read.format("bam").option("splitSize", (2L << 20).toString)
        .load(BamFixture.bigPath)
        .groupBy("refIdx").agg(count(lit(1)).as("n"))
        .orderBy("refIdx")
    },

    // S13 distributed block discovery (no side-car path).
    q("bam_blocks") { (s, _) =>
      BamOps.discoverBlocks(s, BamFixture.default.bamPath, 8).orderBy("start")
    },

    // S15 records side-car relation (ground-truth positions).
    q("bam_records") { (s, _) =>
      BamOps.records(s, BamFixture.default.bamPath)
    },

    // §2.11 check-bam: eager checker vs ground truth → confusion matrix.
    q("bam_check_eager") { (s, _) =>
      BamOps.checkBam(s, BamFixture.tiny.bamPath, "eager")
    },

    // §2.11 check-bam -s: relaxed (hadoop-bam-profile) checker variant.
    q("bam_check_relaxed") { (s, _) =>
      BamOps.checkBam(s, BamFixture.tiny.bamPath, "relaxed")
    },

    // S7 loadSplitsAndReads: realized splits + per-split record counts.
    q("bam_splits") { (s, _) =>
      BamOps.splits(s, BamFixture.default.bamPath, 32768)
    },

    // S5 loadBamIntervals + P2 overlap predicate + F10 record end.
    q("bam_intervals") { (s, _) =>
      BamOps.intervals(s, BamFixture.default.bamPath,
        Seq(("chr1", 0, 400_000), ("chr2", 100_000, 120_000)))
        .groupBy("contig").agg(count(lit(1)).as("n"), min("pos").as("first_pos"),
          max("endPos").as("last_end"))
        .orderBy("contig")
    },

    // S5 over the STANDARD index: same interval query against a copy of
    // the fixture that carries ONLY a freshly-built `.bai` (no engine
    // side-cars) — the pruning path every real-world sorted BAM takes.
    // The copy+index build runs once per JVM (Bench's un-timed warmup).
    q("bam_intervals_bai") { (s, _) =>
      BamOps.intervals(s, baiOnly(s),
        Seq(("chr1", 0, 400_000), ("chr2", 100_000, 120_000)))
        .groupBy("contig").agg(count(lit(1)).as("n"), min("pos").as("first_pos"),
          max("endPos").as("last_end"))
        .orderBy("contig")
    },

    // S5/P2 long-read stress: the same BAI-pruned interval shape over the
    // 10k-200k-base fixture, where EVERY record spans many BGZF blocks —
    // the reference's hardest error domain (GiaB long reads,
    // docs/benchmarks.md:24-26; hadoop-bam's false negatives occurred on
    // exactly these chunk-spanning records, :38). A pruned scan must
    // neither drop nor duplicate a record whose bytes straddle pruned
    // chunk boundaries; exact no-dup/no-drop pinned in PushdownSpec.
    q("bam_longread_intervals") { (s, _) =>
      BamOps.intervals(s, longReadBai(s),
        Seq(("chr1", 100_000, 600_000), ("chr2", 0, 300_000)))
        .groupBy("contig").agg(count(lit(1)).as("n"), min("pos").as("first_pos"),
          max("endPos").as("last_end"))
        .orderBy("contig")
    },

    // S5 user surface: the loci STRING grammar end-to-end — parse,
    // resolve open ends against the header dictionary, interval filter.
    q("bam_loci") { (s, _) =>
      BamOps.intervalsFromLoci(s, BamFixture.default.bamPath,
        "chr1:0-400_000,chr2:100_000-120_000,chr3:500_000-")
        .groupBy("contig").agg(count(lit(1)).as("n"), min("pos").as("first_pos"))
        .orderBy("contig")
    },

    // A5/A6 histogram shape on BAM data: flags histogram, desc by count.
    q("bam_flags_hist") { (s, _) =>
      s.read.format("bam").load(BamFixture.default.bamPath)
        .groupBy("flags").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("flags"))
    },

    // §2.11 full-check: error-flag-combination histogram (A6/A7/F9).
    q("bam_full_hist") { (s, _) =>
      FullCheckOps.flagsHistogram(
        FullCheckOps.fullCalls(s, BamFixture.tiny.bamPath))
    },

    // §2.11 full-check: positions-per-flag-count PDF + CDF (A8/A9/P8).
    q("bam_full_cdf") { (s, _) =>
      FullCheckOps.numFlagsCdf(
        FullCheckOps.fullCalls(s, BamFixture.tiny.bamPath))
    },

    // S3 loadSam vs S2 loadBam parity: per-contig counts from both
    // sources (the count-reads compare harness, §2.11).
    q("bam_sam_parity") { (s, _) =>
      val fx = BamFixture.default
      val samPath = BamFixture.writeSam(fx)
      val bam = s.read.format("bam").load(fx.bamPath)
        .groupBy("refIdx").agg(count(lit(1)).as("n_bam"))
      val sam = graft.bam.ops.SamOps.loadSam(s, samPath)
        .groupBy("refIdx").agg(count(lit(1)).as("n_sam"))
      bam.join(sam, Seq("refIdx"), "full_outer").orderBy("refIdx")
    },

    // §2.11 check-blocks: per-block next-record-start, eager vs truth,
    // with the first-offset histogram column (A5).
    q("bam_check_blocks") { (s, _) =>
      BamOps.checkBlocks(s, BamFixture.tiny.bamPath)
        .groupBy("matches", "firstOffsetInBlock")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("firstOffsetInBlock"))
    },

    // §2.11 compare-splits (A13): race the eager and relaxed split
    // algorithms across a list of BAMs, one task per file, timed; the
    // timing-ratio Stats report shape is pinned in SplitTimingSpec.
    q("bam_compare_splits") { (s, _) =>
      SplitTiming.compareSplits(
        s, Seq(BamFixture.tiny.bamPath, BamFixture.default.bamPath), 32768)
    },

    // §2.11 time-load: first-read-per-partition collection race between
    // the eager and relaxed (hadoop-bam-profile) loaders.
    q("bam_time_load") { (s, _) =>
      SplitTiming.timeLoad(s, BamFixture.default.bamPath, 32768)
    },

    // S16 rewrite round-trip: write a rewritten BAM, read it back,
    // count per contig (driver rows-check; exact equality in ScalaTest).
    q("bam_rewrite") { (s, _) =>
      val fx = BamFixture.tiny
      val out = java.nio.file.Files.createTempDirectory("graft-rw")
        .resolve("rewritten.bam").toString
      BamSink.rewrite(s, fx.bamPath, out)
      s.read.format("bam").load(out)
        .groupBy("refIdx").agg(count(lit(1)).as("n")).orderBy("refIdx")
    }
  )
}
