package graft.bam

import graft.SparkTestBase
import graft.bam.fixtures.BamFixture
import graft.bam.ops.BamOps

class BamOpsSpec extends SparkTestBase {

  test("distributed block discovery equals the by-construction layout") {
    val fx = BamFixture.default
    val got = BamOps.discoverBlocks(spark, fx.bamPath, 8)
      .orderBy("start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val want = fx.blocks.map(m => (m.start, m.compressedSize, m.uncompressedSize))
    assert(got.toSeq == want)
  }

  test("discovery parallelism scales with file size (one split per 32 MiB, floor 8)") {
    val fx = BamFixture.default
    // small fixture → the floor applies
    assert(BamOps.discoverBlocks(spark, fx.bamPath).rdd.getNumPartitions == 8)
    // the big fixture (~51 MB) must cross the 32 MiB split size → 2 splits,
    // but still floored at 8 tasks
    val big = BamFixture.bigPath
    val len = new java.io.File(big).length()
    val expected = math.max(8L, (len + (32L << 20) - 1) / (32L << 20)).toInt
    assert(BamOps.discoverBlocks(spark, big).rdd.getNumPartitions == expected)
    // explicit override still wins
    assert(BamOps.discoverBlocks(spark, fx.bamPath, 3).rdd.getNumPartitions == 3)
  }

  test("blocks() side-car fast path equals discovery") {
    val fx = BamFixture.default
    val viaSidecar = BamOps.blocks(spark, fx.bamPath).orderBy("start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(viaSidecar.toSeq ==
      fx.blocks.map(m => (m.start, m.compressedSize, m.uncompressedSize)))
  }

  test("check-bam: eager checker has zero FPs and zero FNs over all positions") {
    val fx = BamFixture.tiny
    val cells = BamOps.checkBam(spark, fx.bamPath, "eager", numPartitions = 4)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val totalPositions = fx.totalUncompressedPositions
    assert(cells.getOrElse((true, true), 0L) == fx.numRecords, "TPs = every true start")
    assert(cells.getOrElse((false, true), 0L) == 0L, "no false positives")
    assert(cells.getOrElse((true, false), 0L) == 0L, "no false negatives")
    assert(cells.getOrElse((false, false), 0L) ==
      totalPositions - fx.numRecords, "TNs = everything else")
  }

  test("splits partition the file with no loss across split sizes") {
    val fx = BamFixture.default
    Seq(16384L, 65536L).foreach { ss =>
      val rows = BamOps.splits(spark, fx.bamPath, ss).collect()
      assert(rows.map(_.getLong(3)).sum == fx.numRecords, s"splitSize=$ss")
      // split start positions must be true record starts
      val starts = rows.map(r => (r.getLong(1), r.getInt(2)))
      val truth = fx.records.map(r => (r.blockPos, r.offset)).toSet
      assert(starts.forall(truth.contains))
    }
  }

  test("interval query matches brute-force overlap on the generator output") {
    val fx = BamFixture.default
    val ivs = Seq(("chr1", 0, 400_000), ("chr2", 100_000, 120_000))
    val got = BamOps.intervals(spark, fx.bamPath, ivs).count()
    val contigIdx = fx.header.contigs.map(_.name).zipWithIndex.toMap
    val want = fx.records.count { r =>
      r.refIdx >= 0 && ivs.exists { case (c, lo, hi) =>
        contigIdx(c) == r.refIdx && r.pos < hi && r.end > lo
      }
    }
    assert(got == want && got > 0)
  }

  test("check-blocks: eager next-record-start matches truth for every block") {
    val fx = BamFixture.tiny
    val rows = BamOps.checkBlocks(spark, fx.bamPath, numPartitions = 4).collect()
    assert(rows.length == fx.blocks.length)
    assert(rows.forall(_.getAs[Boolean]("matches")),
      "zero mismatches expected on well-formed data")
    // blocks whose first record is at offset 0 vs mid-block
    val byBlock = fx.records.groupBy(_.blockPos)
    rows.foreach { r =>
      val start = r.getAs[Long]("start")
      byBlock.get(start).map(_.minBy(_.offset).offset) match {
        case Some(off) => assert(r.getAs[Int]("firstOffsetInBlock") == off)
        case None => assert(r.isNullAt(r.fieldIndex("firstOffsetInBlock")))
      }
    }
  }

  test("index sinks round-trip through their relations") {
    val fx = BamFixture.default
    val tmp = java.nio.file.Files.createTempDirectory("graft-index").toString
    BamOps.indexRecords(spark, fx.bamPath, s"$tmp/out.records")
    val written = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/out.records"))
    val original = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(fx.recordsPath))
    assert(written == original)
    BamOps.indexBlocks(spark, fx.bamPath, s"$tmp/out.blocks")
    val wb = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/out.blocks"))
    val ob = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(fx.blocksPath))
    assert(wb == ob)
  }
}
