package graft.bam

import org.scalatest.funsuite.AnyFunSuite

import graft.bam.check.{Checker, FindBlockStart, FindRecordStart}
import graft.bam.codec.Pos
import graft.bam.fixtures.BamFixture
import graft.bam.io.{BlockReader, LocalFileInput}

class CheckerSpec extends AnyFunSuite {

  private def withBlocks[T](path: String)(f: BlockReader => T): T = {
    val b = new BlockReader(new LocalFileInput(path))
    try f(b) finally b.close()
  }

  private lazy val fx = BamFixture.tiny
  private lazy val contigLens = fx.header.contigs.map(_.length)

  test("eager checker accepts every true record start") {
    withBlocks(fx.bamPath) { blocks =>
      val c = new Checker(blocks, contigLens)
      fx.records.foreach { r =>
        assert(c.eager(r.virtualPos), s"rejected true start ${r.virtualPos}")
      }
    }
  }

  test("eager checker rejects shifted positions") {
    withBlocks(fx.bamPath) { blocks =>
      val c = new Checker(blocks, contigLens)
      val truth = fx.recordPositions.toSet
      // probe a band of offsets around each of the first 40 records
      var falsePos = 0
      fx.records.take(40).foreach { r =>
        (1 to 8).foreach { d =>
          val p = Pos(r.blockPos, r.offset + d)
          if (!truth.contains(p) && c.eager(p)) falsePos += 1
        }
      }
      assert(falsePos == 0, s"$falsePos false positives")
    }
  }

  test("full checker flags header bytes and agrees with eager") {
    withBlocks(fx.bamPath) { blocks =>
      val c = new Checker(blocks, contigLens)
      // position 0 = BAM magic, definitely not a record start
      val f = c.full(Pos(0, 0))
      assert(f.isDefined && !f.get.ok)
      assert(!c.eager(Pos(0, 0)))
      // at a true start, full agrees
      assert(c.full(fx.records.head.virtualPos).isEmpty)
    }
  }

  test("relaxed checker is weaker-or-equal to eager") {
    withBlocks(fx.bamPath) { blocks =>
      val c = new Checker(blocks, contigLens)
      fx.records.take(60).foreach { r =>
        assert(c.relaxed(r.virtualPos), "relaxed must accept true starts")
      }
    }
  }

  test("EOF at exact record boundary is a success") {
    withBlocks(fx.bamPath) { blocks =>
      val c = new Checker(blocks, contigLens)
      val last = fx.records.last
      // checking the last record runs into clean EOF before readsToCheck
      assert(c.eager(last.virtualPos))
    }
  }

  test("FindBlockStart recovers block boundaries from arbitrary offsets") {
    withBlocks(fx.bamPath) { blocks =>
      val starts = fx.blocks.map(_.start)
      // from a byte inside block i, the next boundary is block i+1
      starts.sliding(2).take(20).foreach {
        case Seq(a, b) =>
          assert(FindBlockStart(blocks, a + 1) == b)
          assert(FindBlockStart(blocks, a) == a)
        case _ =>
      }
    }
  }

  test("FindRecordStart finds the first record of each block") {
    withBlocks(fx.bamPath) { blocks =>
      val c = new Checker(blocks, contigLens)
      val byBlock = fx.records.groupBy(_.blockPos)
      fx.blocks.take(15).foreach { m =>
        val expected = byBlock.get(m.start).map(_.head.virtualPos)
          .orElse {
            // no record starts in this block: first start in a later block
            fx.records.find(_.blockPos > m.start).map(_.virtualPos)
          }
        val found = FindRecordStart(blocks, c, m.start)
        assert(found == expected, s"block ${m.start}")
      }
    }
  }
}
