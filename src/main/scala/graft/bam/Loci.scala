package graft.bam

/** Genomic-loci string grammar (S5 surface — the reference's
  * `ParsedLoci("1:11000-12000,1:60000-")` + `LociSet(parsed, contigLengths)`
  * resolution, docs/api.md:44-62). The engine keeps the same two-step
  * shape: [[Loci.parse]] is pure string → ranges, [[Loci.resolve]] joins
  * the parse against the BAM header's contig dictionary to close
  * open-ended intervals and validate names.
  *
  * Grammar — comma-separated list of:
  * {{{
  *   all            the whole genome
  *   none           nothing (also: the empty string)
  *   ctg            a whole contig
  *   ctg:pos        the single locus [pos, pos+1)
  *   ctg:lo-hi      the half-open interval [lo, hi)
  *   ctg:lo-        [lo, end of contig)
  * }}}
  * Positions may carry `_` group separators (`1:13_000-14_000`).
  */
object Loci {

  sealed trait Parsed
  /** `all` — every locus of every contig. */
  case object All extends Parsed
  /** Explicit ranges; `endEx = None` = open-ended (to contig end). */
  final case class Ranges(ranges: Seq[LocusRange]) extends Parsed

  final case class LocusRange(contig: String, start: Int, endEx: Option[Int]) {
    require(start >= 0, s"negative locus $start on $contig")
    endEx.foreach(e =>
      require(e > start, s"empty locus range $contig:$start-$e"))
  }

  def parse(str: String): Parsed = {
    val s = str.trim
    if (s.equalsIgnoreCase("all")) return All
    if (s.isEmpty || s.equalsIgnoreCase("none")) return Ranges(Seq.empty)
    Ranges(s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(one).toSeq)
  }

  private def num(s: String): Int = {
    val t = s.replace("_", "").trim
    require(t.nonEmpty && t.forall(_.isDigit), s"bad locus position '$s'")
    t.toInt
  }

  private def one(item: String): LocusRange = item.split(":", 2) match {
    case Array(ctg) => LocusRange(ctg, 0, None)
    case Array(ctg, r) =>
      r.indexOf('-') match {
        case -1 => val p = num(r); LocusRange(ctg, p, Some(p + 1))
        case i =>
          val lo = num(r.substring(0, i))
          val hiStr = r.substring(i + 1).trim
          if (hiStr.isEmpty) LocusRange(ctg, lo, None)
          else LocusRange(ctg, lo, Some(num(hiStr)))
      }
    case _ => throw new IllegalArgumentException(s"bad locus '$item'")
  }

  /** Close open ends against the contig dictionary (name → length) and
    * clamp to contig bounds; unknown contigs are an error, like the
    * reference's LociSet construction. Returns (contig, start, endEx)
    * triples ready for [[graft.bam.ops.BamOps.intervals]]. */
  def resolve(parsed: Parsed,
              contigs: Seq[(String, Int)]): Seq[(String, Int, Int)] =
    parsed match {
      case All => contigs.map { case (n, len) => (n, 0, len) }
      case Ranges(rs) =>
        val byName = contigs.toMap
        rs.map { r =>
          val len = byName.getOrElse(r.contig,
            throw new IllegalArgumentException(
              s"unknown contig '${r.contig}'; header has ${contigs.map(_._1).mkString(",")}"))
          val hi = math.min(r.endEx.getOrElse(len), len)
          require(r.start < hi,
            s"locus range ${r.contig}:${r.start} starts at/after contig end $hi")
          (r.contig, r.start, hi)
        }
    }
}
