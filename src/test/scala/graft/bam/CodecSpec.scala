package graft.bam

import org.scalatest.funsuite.AnyFunSuite

import graft.bam.codec.{Bam, Bgzf, Pos}
import graft.bam.fixtures.BamFixture
import graft.bam.io.{BlockReader, LocalFileInput, UncompressedReader}

class CodecSpec extends AnyFunSuite {

  test("Pos packs/unpacks and orders like the 48/16 virtual offset") {
    val p = Pos(123456789L, 513)
    assert(Pos.unpack(p.packed) == p)
    assert(Pos(2, 0) > Pos(1, 65535))
    assert(Pos(1, 2) > Pos(1, 1))
    assert(Pos.parse("55:12") == Pos(55, 12))
  }

  test("BGZF compress/inflate round-trips arbitrary bytes") {
    val rnd = new java.util.Random(1)
    val data = new Array[Byte](200_000)
    rnd.nextBytes(data) // incompressible worst case
    val (image, metas) = Bgzf.compress(data, payloadSize = 50_000)
    assert(metas.length == 4)
    assert(metas.map(_.uncompressedSize).sum == data.length)
    // walk blocks off the image
    var off = 0L
    val out = new java.io.ByteArrayOutputStream()
    metas.foreach { m =>
      assert(m.start == off)
      val size = Bgzf.checkHeader(image, off.toInt, Bgzf.HeaderSize)
      assert(size == m.compressedSize)
      out.write(Bgzf.inflate(image, off.toInt, size))
      off += size
    }
    assert(java.util.Arrays.equals(out.toByteArray, data))
    // EOF marker terminates the image
    assert(image.length == off + Bgzf.Eof.length)
    assert(Bgzf.isize(image, off.toInt, Bgzf.Eof.length) == 0)
  }

  test("StreamWriter is byte-identical to batch compress and flushes incrementally") {
    val rnd = new scala.util.Random(42)
    val data = Array.fill(300 * 1024)(rnd.nextInt(256).toByte)
    val ps = 16 * 1024
    val (batch, _) = Bgzf.compress(data, ps)
    val batchBody = java.util.Arrays.copyOf(batch, batch.length - Bgzf.Eof.length)

    // Count bytes reaching the sink BEFORE finish(): proves blocks are
    // emitted as input arrives (peak heap = one payload buffer), not
    // buffered until the end.
    var sunkBeforeFinish = -1L
    val sink = new java.io.ByteArrayOutputStream() {
      def sunk: Long = size().toLong
    }
    val sw = new Bgzf.StreamWriter(sink, ps)
    // feed in awkward chunk sizes to exercise the buffer-boundary logic
    var off = 0
    val chunks = Seq(1, 7, ps - 1, ps, ps + 1, 3, 50000)
    var ci = 0
    while (off < data.length) {
      val len = math.min(chunks(ci % chunks.length), data.length - off)
      sw.write(data, off, len)
      off += len
      ci += 1
    }
    sunkBeforeFinish = sink.sunk
    sw.finish()

    assert(sink.toByteArray.sameElements(batchBody),
      "streamed image must equal batch-compressed image (minus EOF)")
    val fullBlocks = data.length / ps
    assert(sw.blocksWritten == fullBlocks + (if (data.length % ps == 0) 0 else 1))
    assert(sw.bytesWritten == data.length.toLong)
    assert(sunkBeforeFinish > 0,
      "blocks must reach the sink before finish() — no whole-stream buffering")
  }

  test("checkHeader rejects non-BGZF bytes") {
    val junk = Array.fill[Byte](18)(0x42)
    assert(Bgzf.checkHeader(junk, 0, 18) == -1)
    assert(Bgzf.checkHeader(Bgzf.Eof, 0, 18) == Bgzf.Eof.length)
  }

  test("BAM record codec round-trips through a BGZF file") {
    val fx = BamFixture.tiny
    val blocks = new BlockReader(new LocalFileInput(fx.bamPath))
    try {
      val r = new UncompressedReader(blocks)
      assert(r.seek(Pos(0, 0)))
      val header = Bam.readHeader(r)
      assert(header.contigs == BamFixture.DefaultContigs)
      assert(header.firstRecord == fx.header.firstRecord)
      val got = Iterator.continually(Bam.readRecord(r)).takeWhile(_ != null).toVector
      assert(got.length == fx.numRecords)
      got.zip(fx.records).foreach { case (a, b) =>
        assert(a == b, s"record mismatch at ${b.virtualPos}")
      }
    } finally blocks.close()
  }

  test("fixture side-cars agree with the in-memory layout") {
    val fx = BamFixture.tiny
    val recordLines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(fx.recordsPath))
    assert(recordLines.size == fx.numRecords)
    assert(recordLines.get(0) ==
      s"${fx.records.head.blockPos},${fx.records.head.offset}")
    val blockLines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(fx.blocksPath))
    assert(blockLines.size == fx.blocks.length)
    // tiny payloadSize guarantees records straddle block boundaries
    assert(fx.blocks.length > 10)
    val starts = fx.records.map(_.blockPos).distinct
    assert(starts.length > 1, "records should span multiple blocks")
  }

  test("metadata-only scan skips inflation but sees the same layout") {
    val fx = BamFixture.tiny
    val blocks = new BlockReader(new LocalFileInput(fx.bamPath))
    try {
      var start = 0L
      val metas = Iterator.continually {
        val m = blocks.metadataAt(start)
        m.foreach(mm => start += mm.compressedSize)
        m
      }.takeWhile(_.isDefined).map(_.get).toVector
      assert(metas == fx.blocks.toVector)
    } finally blocks.close()
  }
}
