package graft.bam.ds

import org.apache.spark.sql.sources._

import graft.bam.codec.Bgzf

/** Genomic interval index — the engine's BAI analog (reference reads the
  * BAI to prune chunks, load/.../Intervals.scala:108-207; we keep the same
  * planning role with a simpler, self-describing side-car).
  *
  * `.gri` side-car: one CSV line per BGZF block that contains ≥1 record
  * start — `blockStart,compressedSize,minRefIdx,minPos,maxRefIdx,maxPos`
  * where min/max are over the records *starting* in that block. For
  * coordinate-sorted BAMs this gives tight per-block genomic ranges, so
  * contig/pos predicates prune compressed byte ranges before any task is
  * planned.
  */
object GenomicIndex {

  final case class BlockRange(start: Long, compressedSize: Int,
                              minRef: Int, minPos: Int, maxRef: Int, maxPos: Int)

  /** One conjunctive genomic constraint; a query prunes with a
    * disjunction of these. `posHi` exclusive. Bounds are LONG so the
    * exclusive upper bound of an int32 predicate is always representable:
    * `pos = Int.MaxValue` needs hi = Int.MaxValue + 1, which in Int
    * arithmetic wraps to MinValue and turns a satisfiable query into
    * "provably empty" (zero partitions, silently missing rows). */
  final case class GBound(refIdx: Option[Int], posLo: Long, posHi: Long) {
    def intersect(o: GBound): Option[GBound] = {
      val ri = (refIdx, o.refIdx) match {
        case (Some(a), Some(b)) if a != b => return None
        case (a, b) => a.orElse(b)
      }
      val lo = math.max(posLo, o.posLo)
      val hi = math.min(posHi, o.posHi)
      if (lo >= hi) None else Some(GBound(ri, lo, hi))
    }
    def matches(b: BlockRange): Boolean = {
      refIdx match {
        case Some(ri) =>
          if (ri < b.minRef || ri > b.maxRef) return false
          // pos range is only tight when the block is single-contig
          if (b.minRef == b.maxRef)
            b.maxPos >= posLo && b.minPos < posHi
          else true
        case None => true
      }
    }
  }
  val Unbounded: GBound = GBound(None, Long.MinValue, Long.MaxValue)

  def sidecarPath(bamPath: String): String = bamPath + ".gri"

  def read(bamPath: String): Option[Seq[BlockRange]] = {
    val hp = new org.apache.hadoop.fs.Path(sidecarPath(bamPath))
    val fs = hp.getFileSystem(BamDataSource.hadoopConf())
    if (!fs.exists(hp)) None
    else {
      val in = fs.open(hp)
      try Some(
        scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).map { ln =>
            val p = ln.split(",")
            BlockRange(p(0).toLong, p(1).toInt, p(2).toInt, p(3).toInt,
              p(4).toInt, p(5).toInt)
          }.toList)
      finally in.close()
    }
  }

  def write(bamPath: String, ranges: Seq[BlockRange]): Unit = {
    val hp = new org.apache.hadoop.fs.Path(sidecarPath(bamPath))
    val fs = hp.getFileSystem(BamDataSource.hadoopConf())
    val w = new java.io.PrintWriter(fs.create(hp, true))
    try ranges.sortBy(_.start).foreach(r => w.println(
      s"${r.start},${r.compressedSize},${r.minRef},${r.minPos},${r.maxRef},${r.maxPos}"))
    finally w.close()
  }

  /** Translate a pushed filter tree into a disjunction of genomic bounds.
    * Unknown predicates widen to Unbounded (conservative — residual
    * evaluation keeps results exact). Returns None when the tree gives no
    * pruning power at all. */
  def toBounds(filters: Seq[Filter], contigToIdx: Map[String, Int]): Option[Seq[GBound]] = {
    def one(f: Filter): Seq[GBound] = f match {
      case And(l, r) =>
        for (a <- one(l); b <- one(r); c <- a.intersect(b).toSeq) yield c
      case Or(l, r) => one(l) ++ one(r)
      case EqualTo("refIdx", v: Int) => Seq(GBound(Some(v), Long.MinValue, Long.MaxValue))
      case EqualTo("contig", v: String) =>
        contigToIdx.get(v).map(i => GBound(Some(i), Long.MinValue, Long.MaxValue))
          .map(Seq(_)).getOrElse(Seq.empty) // unknown contig: no rows
      case GreaterThan("pos", v: Int) => Seq(GBound(None, v.toLong + 1, Long.MaxValue))
      case GreaterThanOrEqual("pos", v: Int) => Seq(GBound(None, v, Long.MaxValue))
      case LessThan("pos", v: Int) => Seq(GBound(None, Long.MinValue, v))
      case LessThanOrEqual("pos", v: Int) =>
        Seq(GBound(None, Long.MinValue, v.toLong + 1))
      case EqualTo("pos", v: Int) => Seq(GBound(None, v, v.toLong + 1))
      case _ => Seq(Unbounded)
    }
    // the filter array is a conjunction
    val combined = filters.map(one).reduceOption { (as, bs) =>
      for (a <- as; b <- bs; c <- a.intersect(b).toSeq) yield c
    }
    combined match {
      case None => None
      case Some(bs) if bs.exists(b => b == Unbounded) => None
      case Some(bs) if bs.isEmpty => Some(Seq.empty) // provably empty
      case Some(bs) => Some(bs)
    }
  }

  /** The subset of pushed filters the index understands (for explain). */
  def supported(filters: Array[Filter], contigToIdx: Map[String, Int]): Array[Filter] =
    filters.filter(f => toBounds(Seq(f), contigToIdx).isDefined)

  /** Prune + re-split: qualifying blocks, adjacent runs merged, runs cut
    * at splitSize. Returns compressed byte ranges for planInputPartitions. */
  def pruneRanges(index: Seq[BlockRange], bounds: Seq[GBound],
                  splitSize: Long): Seq[(Long, Long)] = {
    val keep = index.filter(b => bounds.exists(_.matches(b))).sortBy(_.start)
    // merge adjacent blocks into runs
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    keep.foreach { b =>
      val end = b.start + b.compressedSize
      runs.lastOption match {
        case Some((s, e)) if e == b.start => runs(runs.length - 1) = (s, end)
        case _ => runs += ((b.start, end))
      }
    }
    runs.toSeq.flatMap { case (s, e) =>
      (s until e by splitSize).map(x => (x, math.min(x + splitSize, e)))
    }
  }
}
