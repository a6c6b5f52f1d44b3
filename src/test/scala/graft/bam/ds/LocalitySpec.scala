package graft.bam.ds

import org.apache.hadoop.fs.BlockLocation
import org.scalatest.funsuite.AnyFunSuite

/** Byte-weighted host ranking for split locality (S8). */
class LocalitySpec extends AnyFunSuite {

  private def bl(hosts: Seq[String], offset: Long, len: Long) =
    new BlockLocation(hosts.map(h => s"$h:50010").toArray, hosts.toArray,
      offset, len)

  // three 128 MB blocks: A+B, B+C, C+A (typical HDFS 2-replica layout)
  private val M = 1L << 20
  private val locality = new Locality(Array(
    bl(Seq("hostA", "hostB"), 0L, 128 * M),
    bl(Seq("hostB", "hostC"), 128 * M, 128 * M),
    bl(Seq("hostC", "hostA"), 256 * M, 128 * M)))

  test("a range inside one block returns that block's hosts") {
    assert(locality.hostsFor(10 * M, 20 * M).toSet == Set("hostA", "hostB"))
  }

  test("hosts are ranked by overlapped bytes, not block-entry count") {
    // [120M, 250M): 8 MB of block 1, 122 MB of block 2 -> B(130) > C(122) > A(8)
    val got = locality.hostsFor(120 * M, 250 * M)
    assert(got.toSeq == Seq("hostB", "hostC", "hostA"))
  }

  test("a boundary sliver does not outrank the block owner") {
    // [127M, 200M): 1 MB of block 1 (A,B), 72 MB of block 2 (B,C)
    val got = locality.hostsFor(127 * M, 200 * M)
    assert(got.head == "hostB") // 73 MB
    assert(got(1) == "hostC")   // 72 MB
    assert(got(2) == "hostA")   // 1 MB sliver
  }

  test("ranges beyond the blocks and empty layouts are safe") {
    assert(locality.hostsFor(384 * M, 400 * M).isEmpty)
    assert(new Locality(Array.empty).hostsFor(0, 100).isEmpty)
  }

  test("top-3 cap and deterministic tie-break by host name") {
    val many = new Locality(Array(
      bl(Seq("h4", "h3", "h2", "h1"), 0L, 10 * M)))
    assert(many.hostsFor(0, 10 * M).toSeq == Seq("h1", "h2", "h3"))
  }
}
