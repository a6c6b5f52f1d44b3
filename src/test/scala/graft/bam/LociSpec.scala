package graft.bam

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture
import graft.bam.ops.BamOps

/** The loci string grammar (reference docs/api.md:44-62) and its
  * resolution against header contig lengths. */
class LociParseSpec extends AnyFunSuite {
  import Loci._

  private val contigs = Seq("chr1" -> 1000000, "chr2" -> 800000)

  test("full grammar: ranges, open ends, points, whole contigs") {
    assert(parse("chr1:13000-14000") ==
      Ranges(Seq(LocusRange("chr1", 13000, Some(14000)))))
    assert(parse("chr1:60000-") == Ranges(Seq(LocusRange("chr1", 60000, None))))
    assert(parse("chr1:500") == Ranges(Seq(LocusRange("chr1", 500, Some(501)))))
    assert(parse("chr2") == Ranges(Seq(LocusRange("chr2", 0, None))))
    assert(parse("chr1:13_000-14_000") ==
      Ranges(Seq(LocusRange("chr1", 13000, Some(14000)))))
    assert(parse("chr1:1-2,chr2:3-4") == Ranges(Seq(
      LocusRange("chr1", 1, Some(2)), LocusRange("chr2", 3, Some(4)))))
    assert(parse("all") == All)
    assert(parse("none") == Ranges(Seq.empty))
    assert(parse("") == Ranges(Seq.empty))
  }

  test("resolve closes open ends at contig length and validates names") {
    assert(resolve(parse("chr1:60000-"), contigs) == Seq(("chr1", 60000, 1000000)))
    assert(resolve(parse("chr2"), contigs) == Seq(("chr2", 0, 800000)))
    assert(resolve(All, contigs) ==
      Seq(("chr1", 0, 1000000), ("chr2", 0, 800000)))
    // clamp past-the-end
    assert(resolve(parse("chr2:700000-900000"), contigs) ==
      Seq(("chr2", 700000, 800000)))
    intercept[IllegalArgumentException](resolve(parse("chrX:1-2"), contigs))
  }

  test("malformed loci are rejected") {
    intercept[IllegalArgumentException](Loci.parse("chr1:abc"))
    intercept[IllegalArgumentException](Loci.parse("chr1:9-3"))
  }
}

/** End-to-end: loci string → resolved intervals → the same records as the
  * pre-parsed triple API. */
class LociSpec extends SparkTestBase {

  test("intervalsFromLoci equals intervals with pre-parsed triples") {
    val fx = BamFixture.default
    val viaString = BamOps.intervalsFromLoci(spark, fx.bamPath,
      "chr1:0-400_000,chr2:100_000-120_000")
      .select("readName").collect().map(_.getString(0)).sorted.toSeq
    val viaTriples = BamOps.intervals(spark, fx.bamPath,
      Seq(("chr1", 0, 400000), ("chr2", 100000, 120000)))
      .select("readName").collect().map(_.getString(0)).sorted.toSeq
    assert(viaString == viaTriples)
    assert(viaString.nonEmpty)
  }

  test("loci 'none' selects nothing; 'all' selects every mapped read") {
    val fx = BamFixture.tiny
    assert(BamOps.intervalsFromLoci(spark, fx.bamPath, "none").count() == 0)
    val all = BamOps.intervalsFromLoci(spark, fx.bamPath, "all").count()
    val mapped = spark.read.format("bam").load(fx.bamPath)
      .filter(org.apache.spark.sql.functions.col("refIdx") >= 0).count()
    assert(all == mapped)
  }

  test("open-ended loci resolve against the header dictionary") {
    val fx = BamFixture.default
    val contigs = BamOps.readContigs(fx.bamPath)
    val (name, len) = contigs.head
    val open = BamOps.intervalsFromLoci(spark, fx.bamPath, s"$name:0-").count()
    val full = BamOps.intervals(spark, fx.bamPath, Seq((name, 0, len))).count()
    assert(open == full)
  }
}
