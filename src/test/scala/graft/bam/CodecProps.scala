package graft.bam

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.bam.codec.{Bam, Bgzf, Pos}

/** Property tests: the codec must round-trip arbitrary well-formed inputs,
  * not just the fixtures (SURVEY.md §5 new-engine strategy). */
object CodecProps extends Properties("bam.codec") {

  property("bgzf compress/inflate round-trips arbitrary bytes") =
    forAll(Gen.choose(0, 200_000).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))),
           Gen.choose(512, Bgzf.MaxPayload)) { (data, payload) =>
      val (image, metas) = Bgzf.compress(data, payload)
      val out = new java.io.ByteArrayOutputStream()
      metas.foreach { m =>
        val size = Bgzf.checkHeader(image, m.start.toInt, Bgzf.HeaderSize)
        out.write(Bgzf.inflate(image, m.start.toInt, size))
      }
      java.util.Arrays.equals(out.toByteArray, data) &&
        metas.map(_.uncompressedSize.toLong).sum == data.length
    }

  property("pos packing is bijective") =
    forAll(Gen.choose(0L, (1L << 47) - 1), Gen.choose(0, 0xffff)) { (b, o) =>
      Pos.unpack(Pos(b, o).packed) == Pos(b, o)
    }

  private val genName: Gen[String] = for {
    n <- Gen.choose(1, 60)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose('!', '?'), Gen.choose('A', '~')))
  } yield cs.mkString

  private val genCigarOp: Gen[Bam.CigarOp] = for {
    op <- Gen.choose(0, 8)
    len <- Gen.choose(1, 1000)
  } yield Bam.CigarOp(op, len)

  private val genRecord: Gen[Bam.Record] = for {
    refIdx <- Gen.choose(-1, 2)
    pos <- if (refIdx < 0) Gen.const(-1) else Gen.choose(0, 1_000_000)
    mapq <- Gen.choose(0, 254)
    flags <- Gen.choose(0, 0xfff)
    name <- genName
    nCigar <- Gen.choose(0, 5)
    cigar <- Gen.listOfN(nCigar, genCigarOp)
    seqLen <- Gen.choose(0, 120)
    seq <- Gen.listOfN(seqLen, Gen.oneOf("ACGTN=".toSeq)).map(_.mkString)
    qual <- Gen.listOfN(seqLen, Gen.choose[Byte](0, 40)).map(_.toArray)
    tagVal <- Gen.choose(0, 1 << 20)
    strVal <- Gen.alphaNumStr.map(_.take(20))
  } yield Bam.Record(refIdx, pos, mapq, flags, name, cigar, -1, -1, 0,
    seq, qual, Map("XI:i" -> tagVal.toString, "XS:Z" -> strVal),
    blockPos = -1, offset = -1)

  property("record encode/decode round-trips through a BGZF stream") =
    forAll(Gen.listOfN(20, genRecord), Gen.choose(700, 4000)) { (recs, payload) =>
      val out = new java.io.ByteArrayOutputStream()
      val contigs = IndexedSeq(Bam.Contig("c1", 2_000_000),
        Bam.Contig("c2", 2_000_000), Bam.Contig("c3", 2_000_000))
      Bam.writeHeader(out, "@HD\tVN:1.6\n", contigs)
      recs.foreach(Bam.writeRecord(out, _))
      val (image, _) = Bgzf.compress(out.toByteArray, payload)
      val tmp = java.nio.file.Files.createTempFile("prop", ".bam")
      try {
        java.nio.file.Files.write(tmp, image)
        val blocks = new graft.bam.io.BlockReader(
          new graft.bam.io.LocalFileInput(tmp.toString))
        try {
          val r = new graft.bam.io.UncompressedReader(blocks)
          r.seek(Pos(0, 0))
          val header = Bam.readHeader(r)
          val got = Iterator.continually(Bam.readRecord(r))
            .takeWhile(_ != null).toVector
          Prop(header.contigs == contigs) &&
            Prop(got.length == recs.length) &&
            Prop(got.zip(recs).forall { case (a, b) =>
              a.copy(blockPos = -1, offset = -1) == b
            })
        } finally blocks.close()
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }

  property("checker accepts every true start in generated files") =
    forAll(Gen.listOfN(15, genRecord), Gen.choose(700, 2000)) { (recs0, payload) =>
      // checker invariant: mapped records carry cigar+seq — mark the
      // degenerate generated ones unmapped (flag 0x4), as real data would
      val recs = recs0.map(r =>
        if (r.refIdx >= 0 && (r.cigar.isEmpty || r.seq.isEmpty))
          r.copy(flags = r.flags | 4)
        else r)
      val out = new java.io.ByteArrayOutputStream()
      val contigs = IndexedSeq(Bam.Contig("c1", 2_000_000),
        Bam.Contig("c2", 2_000_000), Bam.Contig("c3", 2_000_000))
      Bam.writeHeader(out, "@HD\tVN:1.6\n", contigs)
      val offsets = recs.map { rec =>
        val off = out.size(); Bam.writeRecord(out, rec); off.toLong
      }
      val (image, metas) = Bgzf.compress(out.toByteArray, payload)
      val tmp = java.nio.file.Files.createTempFile("propchk", ".bam")
      try {
        java.nio.file.Files.write(tmp, image)
        val blocks = new graft.bam.io.BlockReader(
          new graft.bam.io.LocalFileInput(tmp.toString))
        try {
          val checker = new graft.bam.check.Checker(blocks, contigs.map(_.length))
          val cum = metas.toIndexedSeq.scanLeft(0L)(_ + _.uncompressedSize)
          def toPos(u: Long): Pos = {
            // cum(i) = uncompressed start of block i; block i covers
            // [cum(i), cum(i+1))
            val idx = math.min(cum.lastIndexWhere(_ <= u), metas.length - 1)
            Pos(metas(idx).start, (u - cum(idx)).toInt)
          }
          Prop(offsets.forall(o => checker.eager(toPos(o)))) &&
            Prop(!checker.eager(Pos(0, 0))) // header magic is never a record
        } finally blocks.close()
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
}
