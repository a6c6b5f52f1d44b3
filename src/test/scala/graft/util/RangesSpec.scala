package graft.util

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture
import graft.bam.ops.BamOps

/** The byte-range-set grammar (reference args/Range.scala:90-141 forms). */
class RangesParseSpec extends AnyFunSuite {

  test("the three element forms: endpoints, offset+length, point") {
    assert(Ranges.parse("100-200") == Seq((100L, 200L)))
    assert(Ranges.parse("100+50") == Seq((100L, 150L)))
    assert(Ranges.parse("1234") == Seq((1234L, 1235L)))
  }

  test("byte-size suffixes go through Bytes.parse") {
    assert(Ranges.parse("64k-1m") == Seq((65536L, 1048576L)))
    assert(Ranges.parse("2m+128k") == Seq((2097152L, 2097152L + 131072L)))
  }

  test("lists merge overlapping and adjacent ranges, sorted") {
    assert(Ranges.parse("300-400,100-250,200-350") == Seq((100L, 400L)))
    assert(Ranges.parse("10-20,20-30") == Seq((10L, 30L)))
    assert(Ranges.parse("10-20,40-50") == Seq((10L, 20L), (40L, 50L)))
  }

  test("contains binary-searches the merged set") {
    val rs = Ranges.parse("10-20,40-50,100+10")
    assert(Ranges.contains(rs, 10) && Ranges.contains(rs, 19))
    assert(!Ranges.contains(rs, 20) && !Ranges.contains(rs, 39))
    assert(Ranges.contains(rs, 105) && !Ranges.contains(rs, 110))
  }

  test("malformed ranges are rejected") {
    intercept[IllegalArgumentException](Ranges.parse("200-100"))
    intercept[IllegalArgumentException](Ranges.parse("100+0"))
    intercept[Exception](Ranges.parse("abc"))
  }
}

/** Wiring: the block catalog restricted by a range-set string. */
class RangesBlocksSpec extends SparkTestBase {

  test("blocksInRanges keeps exactly the blocks starting inside the set") {
    val fx = BamFixture.default
    val all = BamOps.blocks(spark, fx.bamPath)
      .select("start").collect().map(_.getLong(0)).sorted
    assert(all.length > 3)
    val cut = all(all.length / 2)
    val expected = all.filter(s => s < cut)
    val got = BamOps.blocksInRanges(spark, fx.bamPath, s"0-$cut")
      .select("start").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expected.toSeq)
    // a point range selects a single block
    val one = BamOps.blocksInRanges(spark, fx.bamPath, s"${all(1)}")
      .select("start").collect().map(_.getLong(0))
    assert(one.toSeq == Seq(all(1)))
  }
}
