package graft.bam.ds

import java.nio.{ByteBuffer, ByteOrder}

/** Standard `.bai` BAM index — reader, writer, and chunk pruning.
  *
  * Format per the public SAM/BAM specification (§5.2, "The BAI index
  * format"): magic `BAI\1`, per-reference R-tree binning index (bin →
  * chunks of virtual-offset ranges) + 16 kb-window linear index. This is
  * the index every real-world coordinate-sorted BAM ships with; the
  * engine's own `.gri` side-car (GenomicIndex) keeps the same planning
  * role for engine-written files, and both feed the identical pruned-range
  * path in BamScan.planInputPartitions (reference semantics:
  * load/.../Intervals.scala:108-207 BAI chunk pruning).
  */
object Bai {

  final case class Chunk(beg: Long, end: Long) // virtual offsets, end exclusive
  final case class RefIndex(bins: Map[Int, IndexedSeq[Chunk]],
                            linear: IndexedSeq[Long])
  final case class Index(refs: IndexedSeq[RefIndex])

  /** Metadata pseudo-bin (unmapped counts) — not a spatial bin. */
  val PseudoBin = 37450
  /** BAI addresses coordinates < 2^29. */
  val MaxCoord: Int = 1 << 29

  def path(bamPath: String): String = bamPath + ".bai"

  /** Byte length of `p` through the Hadoop FS (works for hdfs://, s3a://…
    * like the scan and sink; a local java.io length would silently be 0 for
    * remote paths). */
  def fileLen(p: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(BamDataSource.hadoopConf()).getFileStatus(hp).getLen
  }

  def read(bamPath: String): Option[Index] = {
    val hp = new org.apache.hadoop.fs.Path(path(bamPath))
    val fs = hp.getFileSystem(BamDataSource.hadoopConf())
    if (!fs.exists(hp)) return None
    val len = fs.getFileStatus(hp).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(hp)
    try in.readFully(0, bytes) finally in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(magic.sameElements("BAI".getBytes :+ 1.toByte),
      s"${path(bamPath)}: bad BAI magic")
    val nRef = bb.getInt
    val refs = (0 until nRef).map { _ =>
      val nBin = bb.getInt
      val bins = (0 until nBin).map { _ =>
        val bin = bb.getInt
        val nChunk = bb.getInt
        bin -> (0 until nChunk).map(_ => Chunk(bb.getLong, bb.getLong))
      }.filter(_._1 != PseudoBin).toMap
      val nIntv = bb.getInt
      RefIndex(bins, (0 until nIntv).map(_ => bb.getLong))
    }
    Some(Index(refs))
  }

  def write(bamPath: String, index: Index): Unit = {
    val size = 8 + index.refs.map(r =>
      8 + r.bins.valuesIterator.map(c => 8 + 16 * c.length).sum + 8L * r.linear.length).sum
    val bb = ByteBuffer.allocate(size.toInt).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("BAI".getBytes).put(1.toByte)
    bb.putInt(index.refs.length)
    index.refs.foreach { r =>
      bb.putInt(r.bins.size)
      r.bins.toSeq.sortBy(_._1).foreach { case (bin, chunks) =>
        bb.putInt(bin)
        bb.putInt(chunks.length)
        chunks.foreach { c => bb.putLong(c.beg); bb.putLong(c.end) }
      }
      bb.putInt(r.linear.length)
      r.linear.foreach(bb.putLong)
    }
    val hp = new org.apache.hadoop.fs.Path(path(bamPath))
    val fs = hp.getFileSystem(BamDataSource.hadoopConf())
    val os = fs.create(hp, true)
    try os.write(bb.array()) finally os.close()
  }

  /** SAM-spec R-tree bin containing [beg, endEx) entirely — one
    * definition for the whole engine (writer and reader must agree). */
  def reg2bin(beg: Int, endEx: Int): Int =
    graft.bam.codec.Bam.reg2bin(beg, endEx)

  /** All bins that can hold records overlapping [beg, endEx). */
  def reg2bins(beg0: Int, endEx0: Int): Seq[Int] = {
    val beg = math.max(0, beg0)
    val end = math.min(MaxCoord, endEx0) - 1
    if (end < beg) return Seq.empty
    Seq(0) ++
      (1 + (beg >> 26) to 1 + (end >> 26)) ++
      (9 + (beg >> 23) to 9 + (end >> 23)) ++
      (73 + (beg >> 20) to 73 + (end >> 20)) ++
      (585 + (beg >> 17) to 585 + (end >> 17)) ++
      (4681 + (beg >> 14) to 4681 + (end >> 14))
  }

  /** Candidate chunks for records overlapping [beg, endEx) on `refIdx`:
    * bins from reg2bins, linear-index lower bound applied, merged. */
  def chunksFor(idx: Index, refIdx: Int, beg0: Int, endEx0: Int): Seq[Chunk] = {
    if (refIdx < 0 || refIdx >= idx.refs.length) return Seq.empty
    val r = idx.refs(refIdx)
    val beg = math.max(0, beg0)
    val endEx = math.min(MaxCoord, endEx0)
    if (beg >= endEx) return Seq.empty
    val w = beg >> 14
    val minOff = if (w < r.linear.length) r.linear(w) else 0L
    val cand = reg2bins(beg, endEx).flatMap(r.bins.get).flatten
      .filter(_.end > minOff)
      .sortBy(_.beg)
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    cand.foreach { c =>
      out.lastOption match {
        case Some(last) if c.beg <= last.end =>
          if (c.end > last.end) out(out.length - 1) = Chunk(last.beg, c.end)
        case _ => out += c
      }
    }
    out.toSeq
  }

  /** GBound disjunction → pruned compressed byte ranges (merged, cut at
    * `splitSize`), for BamScan's planInputPartitions. None when a bound
    * carries no contig — BAI prunes by reference only. Ranges are
    * block-cover supersets; the scan's residual filters keep results
    * exact. */
  def pruneRanges(idx: Index, bounds: Seq[GenomicIndex.GBound],
                  splitSize: Long): Option[Seq[(Long, Long)]] = {
    if (bounds.exists(_.refIdx.isEmpty)) return None
    val raw = bounds.flatMap { b =>
      // clamp the Long bounds into chunksFor's int32 coordinate space —
      // BAI coordinates cap at MaxCoord anyway, so saturation is lossless
      chunksFor(idx, b.refIdx.get,
        math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, b.posLo)).toInt,
        math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, b.posHi)).toInt)
        .map { c =>
        val s = c.beg >>> 16
        // include the end block only if the chunk has bytes in it
        val e = if ((c.end & 0xffffL) == 0L) c.end >>> 16 else (c.end >>> 16) + 1
        (s, math.max(e, s + 1))
      }
    }.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    raw.foreach { case (s, e) =>
      merged.lastOption match {
        case Some((ls, le)) if s <= le =>
          if (e > le) merged(merged.length - 1) = (ls, e)
        case _ => merged += ((s, e))
      }
    }
    Some(merged.toSeq.flatMap { case (s, e) =>
      (s until e by splitSize).map(x => (x, math.min(x + splitSize, e)))
    })
  }
}
