package graft.util

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.bam.Loci

/** Property tests for the loci and byte-range string grammars. */
object GrammarProps extends Properties("grammars") {

  private val contig = Gen.oneOf("chr1", "chr2", "chrX", "ctg_07", "MT")
  private val pos = Gen.chooseNum(0, 500000000)

  property("loci: closed range round-trips") =
    forAll(contig, pos, Gen.chooseNum(1, 1000000)) { (c, lo, len) =>
      Loci.parse(s"$c:$lo-${lo + len}") ==
        Loci.Ranges(Seq(Loci.LocusRange(c, lo, Some(lo + len))))
    }

  property("loci: open range and point round-trip") =
    forAll(contig, pos) { (c, p) =>
      Loci.parse(s"$c:$p-") == Loci.Ranges(Seq(Loci.LocusRange(c, p, None))) &&
        Loci.parse(s"$c:$p") == Loci.Ranges(Seq(Loci.LocusRange(c, p, Some(p + 1))))
    }

  property("loci: comma lists preserve order and arity") =
    forAll(Gen.listOfN(5, Gen.zip(contig, pos))) { items =>
      val s = items.map { case (c, p) => s"$c:$p-${p + 10}" }.mkString(",")
      Loci.parse(s) match {
        case Loci.Ranges(rs) =>
          rs.map(r => (r.contig, r.start)) == items.map { case (c, p) => (c, p) }
        case _ => false
      }
    }

  private val bytePos = Gen.chooseNum(0L, 1L << 40)

  property("ranges: every element form lands in the merged set") =
    forAll(bytePos, Gen.chooseNum(1L, 1L << 20)) { (lo, len) =>
      Ranges.parse(s"$lo-${lo + len}") == Seq((lo, lo + len)) &&
        Ranges.parse(s"$lo+$len") == Seq((lo, lo + len)) &&
        Ranges.parse(s"$lo") == Seq((lo, lo + 1))
    }

  property("ranges: merge output is sorted, disjoint, and covers inputs") =
    forAll(Gen.listOfN(8, Gen.zip(Gen.chooseNum(0L, 10000L), Gen.chooseNum(1L, 500L)))) { raw =>
      val ranges = raw.map { case (s, l) => (s, s + l) }
      val merged = Ranges.merge(ranges)
      val sortedDisjoint = merged.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => s2 > e1
        case _ => true
      }
      val covers = ranges.forall { case (s, e) =>
        Ranges.contains(merged, s) && Ranges.contains(merged, e - 1)
      }
      val noInvention = merged.forall { case (s, e) =>
        Seq(s, e - 1).forall(x => ranges.exists { case (rs, re) => x >= rs && x < re })
      }
      sortedDisjoint && covers && noInvention
    }

  property("ranges: contains agrees with the naive scan") =
    forAll(Gen.listOfN(6, Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(1L, 100L))),
      Gen.chooseNum(0L, 1200L)) { (raw, x) =>
      val merged = Ranges.merge(raw.map { case (s, l) => (s, s + l) })
      Ranges.contains(merged, x) == merged.exists { case (s, e) => x >= s && x < e }
    }
}
