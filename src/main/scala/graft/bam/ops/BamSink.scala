package graft.bam.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.bam.codec.{Bam, Bgzf}

/** BAM writer sink (S16, the htsjdk-rewrite analog,
  * cli/.../bam/rewrite/HTSJDKRewrite.scala:21-93).
  *
  * Scale design: BGZF is closed under concatenation, so each partition
  * independently encodes its (sorted) records into a BGZF shard; the
  * driver stitches header-shard + record-shards + EOF marker. On a real
  * cluster the shards land on the DFS and a compose/concat finishes the
  * file — no single-node encode bottleneck. Records are re-blocked
  * without regard to boundaries, so output records are unaligned to block
  * starts (what makes rewritten files useful checker tests).
  */
object BamSink {

  private def rowToRecord(r: Row): Bam.Record = {
    val cigar = r.getSeq[Row](r.fieldIndex("cigar"))
      .map(c => Bam.CigarOp(c.getInt(0), c.getInt(1)))
    Bam.Record(
      refIdx = r.getInt(r.fieldIndex("refIdx")),
      pos = r.getInt(r.fieldIndex("pos")),
      mapq = r.getInt(r.fieldIndex("mapq")),
      flags = r.getInt(r.fieldIndex("flags")),
      readName = r.getString(r.fieldIndex("readName")),
      cigar = cigar,
      nextRefIdx = r.getInt(r.fieldIndex("nextRefIdx")),
      nextPos = r.getInt(r.fieldIndex("nextPos")),
      templateLen = r.getInt(r.fieldIndex("templateLen")),
      seq = r.getString(r.fieldIndex("seq")),
      qual = r.getAs[Array[Byte]](r.fieldIndex("qual")),
      attrs = r.getMap[String, String](r.fieldIndex("attrs")).toMap,
      blockPos = -1, offset = -1)
  }

  /** Write `reads` (full bam-source schema) as a BAM file. Records are
    * globally ordered by `virtualPos` (stable round-trip order); shards
    * are encoded per partition THROUGH THE HADOOP FILESYSTEM of the target
    * path — on a cluster they land on the DFS next to the output, never on
    * executor-local disk — and the driver stream-concatenates them (BGZF
    * is closed under concatenation). */
  def write(reads: DataFrame, header: Bam.Header, outPath: String,
            payloadSize: Int = 16 * 1024): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = graft.bam.ds.BamDataSource.hadoopConf()
    val outP = new HPath(outPath)
    val fs = outP.getFileSystem(conf)
    val shardDir = new HPath(
      outPath + s".shards-${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(shardDir)
    val contigs = header.contigs
    val text = header.text
    val ps = payloadSize
    val shardDirS = shardDir.toString
    // Ship the DRIVER's Hadoop conf (incl. spark.hadoop.* session settings,
    // e.g. object-store credentials) to the executors: a bare executor-side
    // `new Configuration()` only sees classpath XML, which diverges from the
    // driver on conf-configured clusters.
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val shards = reads
      .repartitionByRange(
        math.max(1, reads.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt / 2),
        col("virtualPos.blockPos"), col("virtualPos.offset"))
      .sortWithinPartitions("virtualPos.blockPos", "virtualPos.offset")
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          // attempt-unique shard path = the task-commit protocol: a
          // speculative or retried attempt writes its OWN file, the driver
          // concatenates only the paths returned by the attempts whose
          // results Spark actually collected (exactly one per partition),
          // and loser/zombie files die with the shard dir. A shared
          // per-partition path would let a zombie attempt keep writing
          // into a file the driver is reading — torn output.
          val shard = new HPath(
            f"$shardDirS/shard-$pid%05d-attempt-${tc.taskAttemptId()}")
          val sfs = shard.getFileSystem(serConf.value)
          val os = new java.io.BufferedOutputStream(sfs.create(shard, true), 1 << 20)
          // Stream-compress: one BGZF member per <= payloadSize bytes AS
          // ROWS ARRIVE. Peak task heap is O(payloadSize + one record),
          // not O(partition) — a rewrite partition at 100x is hundreds of
          // MB of uncompressed record bytes and must never be buffered.
          // No EOF member here; the driver appends exactly one.
          val bw = new Bgzf.StreamWriter(os, ps)
          try {
            rows.foreach(r => Bam.writeRecord(bw, rowToRecord(r)))
            bw.finish()
          } finally os.close()
          Iterator.single(shard.toString)
        }
      }(org.apache.spark.sql.Encoders.STRING)
      .collect()
      .sorted

    val out = new java.io.BufferedOutputStream(fs.create(outP, true), 1 << 20)
    try {
      val hdr = new java.io.ByteArrayOutputStream()
      Bam.writeHeader(hdr, text, contigs)
      val (hImg, _) = Bgzf.compress(hdr.toByteArray, ps)
      out.write(hImg, 0, hImg.length - Bgzf.Eof.length)
      shards.foreach { p =>
        val in = fs.open(new HPath(p))
        try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 1 << 20, false)
        finally in.close()
      }
      out.write(Bgzf.Eof)
    } finally out.close()
    fs.delete(shardDir, true)
  }

  /** The rewrite app: read a BAM, optionally keep a record-index range
    * [lo, hi) in file order (P9 row-number selection), write it back.
    *
    * Re-index options (reference parity: HTSJDKRewrite.scala:21-93 takes
    * `-b` indexBlocks / `-i` indexRecords to index its output):
    *  - `indexBlocks` / `indexRecords` write the `.blocks` / `.records`
    *    side-cars of the OUTPUT file, as the reference's flags do;
    *  - `index` builds the standard `.bai` for the output — the rewritten
    *    layout re-blocks records, so the input's index is useless for it
    *    and interval queries over the output need a fresh one
    *    (pruned-partition parity with an after-the-fact
    *    [[BamOps.indexBai]] is pinned in PushdownSpec). */
  def rewrite(spark: SparkSession, inPath: String, outPath: String,
              range: Option[(Long, Long)] = None,
              index: Boolean = false,
              indexBlocks: Boolean = false,
              indexRecords: Boolean = false): Unit = {
    val reads = spark.read.format("bam").load(inPath)
    val selected = range match {
      case None => reads
      case Some((lo, hi)) =>
        graft.ops.ScalableWindow.rowNumber(reads,
          Seq("virtualPos.blockPos", "virtualPos.offset"), "__rn")
          .filter(col("__rn") > lo && col("__rn") <= hi)
          .drop("__rn")
    }
    val blocks = new graft.bam.io.BlockReader(
      graft.bam.io.SeekableInput.open(inPath))
    val header =
      try {
        val r = new graft.bam.io.UncompressedReader(blocks)
        r.seek(graft.bam.codec.Pos(0, 0))
        Bam.readHeader(r)
      } finally blocks.close()
    write(selected, header, outPath)
    if (indexBlocks) BamOps.indexBlocks(spark, outPath, outPath + ".blocks")
    if (indexRecords) BamOps.indexRecords(spark, outPath, outPath + ".records")
    if (index) BamOps.indexBai(spark, outPath)
  }
}
