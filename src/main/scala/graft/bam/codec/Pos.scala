package graft.bam.codec

/** Virtual file position in a BGZF-compressed file: compressed byte offset of
  * the containing block plus offset into that block's uncompressed payload.
  *
  * Packing matches the de-facto standard 48/16-bit "virtual offset" layout
  * (reference: bgzf/src/main/scala/org/hammerlab/bgzf/Pos.scala:12-42).
  */
final case class Pos(blockPos: Long, offset: Int) extends Ordered[Pos] {
  def packed: Long = (blockPos << 16) | (offset & 0xffffL)

  override def compare(that: Pos): Int = {
    val c = java.lang.Long.compare(blockPos, that.blockPos)
    if (c != 0) c else Integer.compare(offset, that.offset)
  }

  override def toString: String = s"$blockPos:$offset"
}

object Pos {
  def unpack(v: Long): Pos = Pos(v >>> 16, (v & 0xffff).toInt)

  def parse(s: String): Pos = {
    val i = s.indexOf(':')
    Pos(s.substring(0, i).toLong, s.substring(i + 1).toInt)
  }
}
