package graft.bam

/** Typed view of the bam source record (the `Dataset[T]` face of
  * `BamSchema.schema` — SURVEY.md §1.2). The DataFrame surface stays
  * primary (dynamic pruning, SQL); this is for callers that want
  * compile-time field safety on per-record logic. Fields resolve by name
  * against the source schema. */
final case class BamCigarOp(op: Int, len: Int)
final case class BamVPos(blockPos: Long, offset: Int)
final case class BamRead(
    refIdx: Int,
    contig: Option[String],
    pos: Int,
    endPos: Int,
    mapq: Int,
    flags: Int,
    readName: String,
    cigar: Seq[BamCigarOp],
    nextRefIdx: Int,
    nextPos: Int,
    templateLen: Int,
    seq: String,
    qual: Array[Byte],
    attrs: Map[String, String],
    virtualPos: BamVPos) {
  def isUnmapped: Boolean = (flags & 4) != 0
  def isReverse: Boolean = (flags & 0x10) != 0
}
