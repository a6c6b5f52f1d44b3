package graft.bam.ds

import org.apache.hadoop.fs.BlockLocation

/** Split-locality ranking (S8 — the reference's SplitRDD preferred
  * locations, load/.../SplitRDD.scala:27-30, generalized to byte-weighted
  * ranking). One instance per file: block locations are sorted and their
  * offsets materialized ONCE, then each range binary-searches to its
  * first candidate block — planning stays
  * O(ranges × (log blocks + overlap)), not O(ranges × blocks); a 100 TB
  * file at 8 MiB splits is ~12.5M ranges against ~800k filesystem blocks.
  *
  * Hosts are ranked by OVERLAPPED BYTES: a host holding one boundary
  * sliver must not outrank the block owner.
  */
final class Locality(blockLocs: Array[BlockLocation]) {

  private val sorted = blockLocs.sortBy(_.getOffset)
  private val offsets = sorted.map(_.getOffset)

  /** Top-3 hosts for the byte range [s, e). */
  def hostsFor(s: Long, e: Long): Array[String] = {
    if (sorted.isEmpty) return Array.empty
    val ins = java.util.Arrays.binarySearch(offsets, s)
    var i = math.max(0, if (ins >= 0) ins else -(ins + 1) - 1)
    val w = scala.collection.mutable.HashMap.empty[String, Long]
    while (i < sorted.length && sorted(i).getOffset < e) {
      val b = sorted(i)
      val ov = math.min(e, b.getOffset + b.getLength) - math.max(s, b.getOffset)
      if (ov > 0) b.getHosts.foreach(h => w.update(h, w.getOrElse(h, 0L) + ov))
      i += 1
    }
    w.toSeq.sortBy { case (h, bytes) => (-bytes, h) }.take(3).map(_._1).toArray
  }
}
