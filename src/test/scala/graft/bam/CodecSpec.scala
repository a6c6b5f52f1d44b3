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
        m.foreach(mm => start = mm.start + mm.compressedSize)
        m
      }.takeWhile(_.isDefined).map(_.get).toVector
      assert(metas == fx.blocks.toVector)
    } finally blocks.close()
  }

  test("interior EOF markers are skipped, not treated as end-of-stream") {
    // BGZF is closed under concatenation: `cat a b` leaves a's 28-byte
    // EOF marker mid-file, and everything after it must still be read
    val a = "first half ".getBytes("ASCII")
    val b = "second half".getBytes("ASCII")
    val (ia, _) = Bgzf.compress(a, 8) // each image ENDS with the EOF marker
    val (ib, _) = Bgzf.compress(b, 8)
    val tmp = java.nio.file.Files.createTempFile("concat", ".bgzf")
    java.nio.file.Files.write(tmp, ia ++ ib)
    val blocks = new BlockReader(new LocalFileInput(tmp.toString))
    try {
      // metadata walk sees every NON-EMPTY block of both halves
      var at = 0L
      val metas = Iterator.continually {
        val m = blocks.metadataAt(at)
        m.foreach(mm => at = mm.start + mm.compressedSize)
        m
      }.takeWhile(_.isDefined).map(_.get).toVector
      assert(metas.map(_.uncompressedSize).sum == a.length + b.length)
      assert(metas.forall(_.uncompressedSize > 0))
      // the sequential reader crosses the interior marker transparently
      val r = new UncompressedReader(blocks)
      assert(r.seek(Pos(0, 0)))
      val buf = new Array[Byte](a.length + b.length)
      assert(r.readFully(buf, 0, buf.length) == buf.length)
      assert(new String(buf, "ASCII") == "first half second half")
      assert(!r.hasMore || r.readByte() == -1)
    } finally blocks.close()
  }

  test("attrs round-trip every spec tag type incl. B arrays and H hex") {
    val rec = BamFixture.generateRecords(1, BamFixture.DefaultContigs, 5).head
      .copy(attrs = Map(
        "RG:Z" -> "rg1",
        "XA:A" -> "q",
        "XC:c" -> "-3", "XD:C" -> "200",
        "XS:s" -> "-1234", "XT:S" -> "60000",
        "XI:i" -> "-123456", "XJ:I" -> "3000000000",
        "XF:f" -> 1.5f.toString,
        "XH:H" -> "1AFF00",
        "MM:B" -> "c,-1,2,-3",
        "ML:B" -> "C,0,255,128",
        "XB:B" -> "i,-100000,2147483647",
        "XU:B" -> "I,4294967295,0",
        "XE:B" -> s"f,${0.25f},${-3.5f}",
        "XZ:B" -> "S,65535,1"))
    val out = new java.io.ByteArrayOutputStream()
    Bam.writeRecord(out, rec)
    val (img, _) = Bgzf.compress(out.toByteArray)
    val tmp = java.nio.file.Files.createTempFile("attrs", ".bgzf")
    java.nio.file.Files.write(tmp, img)
    val blocks = new BlockReader(new LocalFileInput(tmp.toString))
    try {
      val r = new UncompressedReader(blocks)
      assert(r.seek(Pos(0, 0)))
      val got = Bam.readRecord(r)
      assert(got != null)
      assert(got.attrs == rec.attrs, s"attrs diverged:\n${got.attrs}\n${rec.attrs}")
    } finally blocks.close()
  }
}
