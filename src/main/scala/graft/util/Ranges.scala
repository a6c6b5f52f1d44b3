package graft.util

/** Byte-range-set string grammar (the reference's `Range` argument forms,
  * check/.../args/Range.scala:90-141): a comma-separated list where each
  * element is one of
  * {{{
  *   a-b      the half-open range [a, b)      (Endpoints)
  *   a+len    the half-open range [a, a+len)  (OffsetLength)
  *   p        the single point [p, p+1)       (Point)
  * }}}
  * Elements go through [[Bytes.parse]], so size suffixes work: `64k-1m`,
  * `2m+128k`, `10G`. The result is sorted and overlap-merged (the
  * reference folds its ranges into a guava RangeSet the same way).
  */
object Ranges {

  def parse(s: String): Seq[(Long, Long)] = {
    val raw = s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(one).toSeq
    merge(raw)
  }

  private def one(item: String): (Long, Long) = {
    val dash = item.indexOf('-')
    val plus = item.indexOf('+')
    if (dash > 0) {
      val lo = Bytes.parse(item.substring(0, dash))
      val hi = Bytes.parse(item.substring(dash + 1))
      require(hi > lo, s"empty byte range '$item'")
      (lo, hi)
    } else if (plus > 0) {
      val lo = Bytes.parse(item.substring(0, plus))
      val len = Bytes.parse(item.substring(plus + 1))
      require(len > 0, s"empty byte range '$item'")
      (lo, lo + len)
    } else {
      val p = Bytes.parse(item)
      (p, p + 1)
    }
  }

  /** Sort + merge overlapping/adjacent ranges. */
  def merge(ranges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    ranges.sortBy(_._1).foreach { case (s, e) =>
      out.lastOption match {
        case Some((ls, le)) if s <= le =>
          if (e > le) out(out.length - 1) = (ls, e)
        case _ => out += ((s, e))
      }
    }
    out.toSeq
  }

  /** Is `x` inside any range? Binary search over the merged set. */
  def contains(ranges: Seq[(Long, Long)], x: Long): Boolean = {
    var lo = 0
    var hi = ranges.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (s, e) = ranges(mid)
      if (x < s) hi = mid - 1
      else if (x >= e) lo = mid + 1
      else return true
    }
    false
  }
}
