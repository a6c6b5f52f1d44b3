package graft.bam.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.bam.check.Checker
import graft.bam.codec.Pos
import graft.bam.io.{BlockReader, SeekableInput}

/** Auxiliary BAM relations + the differential-checker pipeline — the
  * reference's CLI analytics (SURVEY.md §2.11) re-expressed as Catalyst
  * plans over the `bam` DSv2 source and the side-car tables.
  */
object BamOps {

  val blocksSchema: StructType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("compressedSize", IntegerType, nullable = false),
    StructField("uncompressedSize", IntegerType, nullable = false)))

  val recordsSchema: StructType = StructType(Seq(
    StructField("blockPos", LongType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  /** `bam_blocks(path)` — the block catalog (S11/S13). Side-car fast path:
    * plain CSV scan. No side-car: distributed discovery — parallelize byte
    * ranges, each task walks headers (metadata-only, no inflate) from the
    * first boundary at-or-after its range start (reference:
    * check/.../bam/check/Blocks.scala:47-208). */
  def blocks(spark: SparkSession, path: String, numSplits: Int = 0): DataFrame = {
    val sidecar = path + ".blocks"
    val hp = new org.apache.hadoop.fs.Path(sidecar)
    if (hp.getFileSystem(graft.bam.ds.BamDataSource.hadoopConf()).exists(hp))
      spark.read.schema(blocksSchema).csv(sidecar)
    else discoverBlocks(spark, path, numSplits)
  }

  /** Discovery parallelism scales with the file: one split per 32 MiB
    * (floor 8), so a side-car-less 100 GB BAM walks headers in ~3200
    * parallel tasks, not a fixed handful. */
  private val DiscoverSplitBytes = 32L << 20

  def discoverBlocks(spark: SparkSession, path: String, numSplits: Int = 0): DataFrame = {
    import spark.implicits._
    val len = graft.bam.ds.Bai.fileLen(path)
    val splits =
      if (numSplits > 0) numSplits
      else math.max(8L, (len + DiscoverSplitBytes - 1) / DiscoverSplitBytes).toInt
    val splitSize = math.max(1L, (len + splits - 1) / splits)
    val bounds = (0L until len by splitSize).map(s => (s, math.min(s + splitSize, len)))
    val conf = graft.bam.ds.BamDataSource.serializableConf()
    spark.createDataset(bounds).repartition(bounds.length)
      .flatMap { case (start, end) =>
        val blocks = new BlockReader(SeekableInput.open(path, conf.value))
        try {
          var at = graft.bam.check.FindBlockStart(blocks, start)
          val out = Seq.newBuilder[(Long, Int, Int)]
          var done = false
          while (!done && at < end) {
            blocks.metadataAt(at) match {
              // m.start can sit PAST `at` (interior EOF markers are
              // skipped): advance from the block actually found, and stop
              // if the skip crossed into the next split's territory (that
              // split's own walk starts at the first header >= its start)
              case Some(m) if m.start < end =>
                out += ((m.start, m.compressedSize, m.uncompressedSize))
                at = m.start + m.compressedSize
              case _ => done = true
            }
          }
          out.result()
        } finally blocks.close()
      }
      .toDF("start", "compressedSize", "uncompressedSize")
  }

  /** `bam_records(path)` — ground-truth record positions side-car (S15
    * read-back, indexed/IndexedRecordPositions.scala:56-76). */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(recordsSchema).csv(path + ".records")

  /** Write the two side-car indexes from their relations (S14/S15 sinks):
    * single files, strictly ordered, like the reference's writers. */
  def indexBlocks(spark: SparkSession, path: String, out: String): Unit =
    writeCsvOrdered(discoverBlocks(spark, path).orderBy("start"), out)
  def indexRecords(spark: SparkSession, path: String, out: String): Unit = {
    val df = spark.read.format("bam").load(path)
      .select(col("virtualPos.blockPos"), col("virtualPos.offset"))
      .orderBy("blockPos", "offset")
    writeCsvOrdered(df, out)
  }
  /** Build the `.gri` genomic index from the source itself: distributed
    * scan → per-block (refIdx,pos) min/max over record starts, joined to
    * the block catalog for sizes, streamed to the side-car in sorted order
    * (no full collect — one block row in driver memory at a time). */
  def indexGenomic(spark: SparkSession, path: String): Unit = {
    val mins = spark.read.format("bam").load(path)
      .groupBy(col("virtualPos.blockPos").as("bp"))
      .agg(min("refIdx").as("minRef"), min("pos").as("minPos"),
        max("refIdx").as("maxRef"), max("pos").as("maxPos"))
    val rows = mins
      .join(blocks(spark, path), col("bp") === col("start"))
      .orderBy("bp")
      .select(col("bp"), col("compressedSize"),
        col("minRef"), col("minPos"), col("maxRef"), col("maxPos"))
    // write through GenomicIndex (Hadoop FS) — a local PrintWriter breaks
    // for hdfs://-style paths, which is where the reader resolves it
    graft.bam.ds.GenomicIndex.write(path,
      rows.toLocalIterator().asScala.map { r =>
        graft.bam.ds.GenomicIndex.BlockRange(r.getLong(0), r.getInt(1),
          r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      }.toSeq)
  }

  /** SAM-spec R-tree bin of [beg, endEx) as a column (see Bai.reg2bin). */
  private def binCol(beg: org.apache.spark.sql.Column,
                     endEx: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val e = endEx - 1
    when(shiftright(beg, 14) === shiftright(e, 14), shiftright(beg, 14) + 4681)
      .when(shiftright(beg, 17) === shiftright(e, 17), shiftright(beg, 17) + 585)
      .when(shiftright(beg, 20) === shiftright(e, 20), shiftright(beg, 20) + 73)
      .when(shiftright(beg, 23) === shiftright(e, 23), shiftright(beg, 23) + 9)
      .when(shiftright(beg, 26) === shiftright(e, 26), shiftright(beg, 26) + 1)
      .otherwise(0)
  }

  /** Build a standard `.bai` for a coordinate-sorted BAM from the source
    * itself. Record spans and virtual positions are computed distributed —
    * a record's end virtual offset is its successor's start (BAM records
    * are contiguous in the uncompressed stream), via the two-phase global
    * lead — then reduced to one chunk per (ref, bin) plus the 16 kb-window
    * linear index. Only the index rows (one per bin/window) reach the
    * driver for the final small binary write, like the reference's index
    * writers. */
  def indexBai(spark: SparkSession, path: String): Unit = {
    import graft.bam.ds.Bai
    val fileLen = Bai.fileLen(path)
    val vpos = shiftleft(col("virtualPos.blockPos"), 16)
      .bitwiseOR(col("virtualPos.offset").cast("long"))
    val recs = spark.read.format("bam").load(path)
      .select(col("refIdx"), col("pos"), col("endPos"), vpos.as("vpos64"))
    val withEnd = graft.ops.ScalableWindow.lead1(
      recs, Seq("vpos64"), "vpos64", "endVpos", lit(fileLen << 16))
    val mapped = withEnd.filter(col("refIdx") >= 0)
      .withColumn("e", greatest(col("endPos"), col("pos") + 1))
    // Chunks per CONTIGUOUS record run inside each (ref, bin) — the spec's
    // many-chunks-per-bin shape (reference reader: check/.../bam/index/
    // Index.scala:11-92) — rather than one min..max span per bin, which
    // over-covers cold bytes when a bin's coordinate clusters are
    // fragmented. Gaps-and-islands over the bin's records in vpos order: a
    // new chunk starts where the record does not continue its bin-
    // predecessor's end AND sits in a different compressed block (the
    // standard chunk-merge rule — interleaved bins must not fragment into
    // per-record chunks). The window is partitioned by (ref, bin), so no
    // single-partition cliff.
    val binW = org.apache.spark.sql.expressions.Window
      .partitionBy("refIdx", "bin").orderBy("vpos64")
    val prevEnd = lag("endVpos", 1).over(binW)
    val chunkRows = mapped
      .withColumn("bin", binCol(col("pos"), col("e")))
      .withColumn("newRun",
        when(prevEnd.isNull ||
          (col("vpos64") =!= prevEnd &&
            shiftright(col("vpos64"), 16) =!= shiftright(prevEnd, 16)), 1L)
          .otherwise(0L))
      .withColumn("run", sum("newRun").over(
        binW.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("refIdx", "bin", "run")
      .agg(min("vpos64").as("beg"), max("endVpos").as("end"))
      .collect()
    val linearRows = mapped
      .withColumn("w",
        explode(sequence(shiftright(col("pos"), 14), shiftright(col("e") - 1, 14))))
      .groupBy("refIdx", "w").agg(min("vpos64").as("off"))
      .collect()
    val nRefs = readContigLens(path).length
    val refs = (0 until nRefs).map { ref =>
      val bins = chunkRows.iterator.filter(_.getInt(0) == ref)
        .map(r => (r.getInt(1), Bai.Chunk(r.getLong(3), r.getLong(4))))
        .toSeq.groupBy(_._1)
        .map { case (bin, cs) => bin -> cs.map(_._2).sortBy(_.beg).toIndexedSeq }
      val lin = linearRows.iterator.filter(_.getInt(0) == ref)
        .map(r => r.getInt(1) -> r.getLong(2)).toMap
      val maxW = if (lin.isEmpty) -1 else lin.keys.max
      Bai.RefIndex(bins, IndexedSeq.tabulate(maxW + 1)(w => lin.getOrElse(w, 0L)))
    }
    Bai.write(path, Bai.Index(refs.toIndexedSeq))
  }

  /** Ordered single-file writer: streams partitions through the driver one
    * at a time (`toLocalIterator`) — constant driver memory, matching the
    * reference's single-file index sinks without their full materialize. */
  private def writeCsvOrdered(df: DataFrame, out: String): Unit = {
    val w = new java.io.PrintWriter(out)
    try df.toLocalIterator().forEachRemaining(r =>
      w.println((0 until r.length).map(r.get).mkString(",")))
    finally w.close()
  }

  /** Per-position checker calls: explode every uncompressed position of
    * every block and evaluate the eager + relaxed checkers. One
    * `BlockReader`+`Checker` pair per partition, closed on task end —
    * the reference's CallPartition pattern (cli/.../CallPartition.scala:34-53)
    * as `mapPartitions` over a range-partitioned block catalog. */
  def checkerCalls(spark: SparkSession, path: String, numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val contigLens = readContigLens(path)
    val blockMetas = blocks(spark, path)
      .repartitionByRange(numPartitions, col("start"))
      .as[(Long, Int, Int)]
    val conf = graft.bam.ds.BamDataSource.serializableConf()
    blockMetas.mapPartitions { metas =>
      if (!metas.hasNext) Iterator.empty
      else {
        val blocks = new BlockReader(SeekableInput.open(path, conf.value))
        val checker = new Checker(blocks, contigLens)
        org.apache.spark.TaskContext.get() match {
          case null => // driver-side (tests): rely on GC
          case tc => tc.addTaskCompletionListener[Unit](_ => blocks.close())
        }
        metas.flatMap { case (start, _, usize) =>
          (0 until usize).iterator.map { off =>
            val p = Pos(start, off)
            (start, off, checker.eager(p), checker.relaxed(p))
          }
        }
      }
    }.toDF("blockPos", "offset", "eagerCall", "relaxedCall")
  }

  /** check-bam (§2.11): calls ⋈ ground truth (J1) → confusion matrix (A2).
    * `expected` = position is a true record start per the `.records`
    * side-car; one row per (expected, call) cell with counts. */
  def checkBam(spark: SparkSession, path: String, checker: String = "eager",
               numPartitions: Int = 8): DataFrame = {
    val calls = checkerCalls(spark, path, numPartitions)
    val truth = records(spark, path).withColumn("isRecord", lit(true))
    val callCol = if (checker == "relaxed") col("relaxedCall") else col("eagerCall")
    calls
      .join(truth, Seq("blockPos", "offset"), "left_outer")
      .select(coalesce(col("isRecord"), lit(false)).as("expected"),
        callCol.as("call"))
      .groupBy("expected", "call").agg(count(lit(1)).as("n"))
      .orderBy("expected", "call")
  }

  /** check-blocks (§2.11, cli/.../blocks/CheckBlocks.scala:29-194): for
    * every block, the eager checker's next-record-start from the block
    * head vs the ground truth from the `.records` side-car; emits one row
    * per block with both positions, the mismatch flag, and the in-block
    * first-record offset (the reference's first-offset histogram input,
    * A5). */
  def checkBlocks(spark: SparkSession, path: String,
                  numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val contigLens = readContigLens(path)
    val conf = graft.bam.ds.BamDataSource.serializableConf()
    val eager = blocks(spark, path)
      .repartitionByRange(numPartitions, col("start"))
      .as[(Long, Int, Int)]
      .mapPartitions { metas =>
        if (!metas.hasNext) Iterator.empty
        else {
          val blocks = new BlockReader(SeekableInput.open(path, conf.value))
          val checker = new Checker(blocks, contigLens)
          org.apache.spark.TaskContext.get() match {
            case null =>
            case tc => tc.addTaskCompletionListener[Unit](_ => blocks.close())
          }
          metas.map { case (start, _, _) =>
            graft.bam.check.FindRecordStart(blocks, checker, start) match {
              case Some(p) => (start, p.blockPos, p.offset)
              case None => (start, -1L, -1)
            }
          }
        }
      }.toDF("start", "eagerBlock", "eagerOffset")
    // truth: first record position at-or-after each block start, filled
    // backward from the per-block minima. Two-phase distributed fill
    // (graft.ops.ScalableWindow) — a bare Window.orderBy here would drag
    // the whole block catalog (~10⁹ rows at 100 TB) through one task.
    val firstPerBlock = records(spark, path)
      .groupBy("blockPos").agg(min("offset").as("ownFirst"))
    val joined = blocks(spark, path)
      .join(firstPerBlock, col("start") === col("blockPos"), "left")
      .withColumn("ownPos", when(col("ownFirst").isNotNull,
        struct(col("start").as("b"), col("ownFirst").as("o"))))
    val truth = graft.ops.ScalableWindow
      .fillBackward(joined, Seq("start"), col("ownPos"), "tp")
      .select(col("start"),
        coalesce(col("tp.b"), lit(-1L)).as("truthBlock"),
        coalesce(col("tp.o"), lit(-1)).as("truthOffset"))
    eager.join(truth, "start")
      .withColumn("matches",
        col("eagerBlock") === col("truthBlock") &&
          col("eagerOffset") === col("truthOffset"))
      .withColumn("firstOffsetInBlock",
        when(col("eagerBlock") === col("start"), col("eagerOffset")))
      .select("start", "eagerBlock", "eagerOffset", "truthBlock",
        "truthOffset", "matches", "firstOffsetInBlock")
  }

  /** compute-splits analog (S7): the realized split layout — per input
    * partition, its first record position and record count. */
  def splits(spark: SparkSession, path: String, splitSize: Long): DataFrame = {
    spark.read.format("bam").option("splitSize", splitSize.toString).load(path)
      .select(spark_partition_id().as("split"),
        col("virtualPos.blockPos").as("blockPos"),
        col("virtualPos.offset").as("offset"))
      .groupBy("split")
      .agg(min(struct(col("blockPos"), col("offset"))).as("start"),
        count(lit(1)).as("numRecords"))
      .select(col("split"), col("start.blockPos").as("startBlock"),
        col("start.offset").as("startOffset"), col("numRecords"))
      .orderBy("split")
  }

  /** loadBamIntervals analog (S5/P2): records overlapping any of the given
    * (contig, start, end) half-open intervals. The overlap predicate is a
    * plain Catalyst filter (pushdown-eligible); interval list is tiny and
    * inlined — the broadcast-join form of J4. */
  def intervals(spark: SparkSession, path: String,
                ivs: Seq[(String, Int, Int)]): DataFrame = {
    val reads = spark.read.format("bam").load(path)
    // empty interval set (loci "none") selects nothing, not everything
    val cond = ivs.map { case (c, lo, hi) =>
      col("contig") === c && col("pos") < hi && col("endPos") > lo
    }.reduceOption(_ || _).getOrElse(lit(false))
    reads.filter(col("refIdx") >= 0 && cond)
  }

  /** loadBamIntervals from a loci STRING (`"1:13000-14000,1:60000-"`) — the
    * reference's user-facing surface (ParsedLoci + LociSet resolution
    * against header contig lengths, docs/api.md:44-62). Open-ended ranges
    * close at the contig end from this file's header dictionary. */
  def intervalsFromLoci(spark: SparkSession, path: String,
                        loci: String): DataFrame =
    intervals(spark, path,
      graft.bam.Loci.resolve(graft.bam.Loci.parse(loci), readContigs(path)))

  /** The block catalog restricted to a byte-range-set string
    * (`"0-64k,1m+128k"` — the reference check apps' `--ranges` option,
    * args/Range.scala grammar): blocks whose compressed start falls in the
    * set. Driver-side parse, distributed filter. */
  def blocksInRanges(spark: SparkSession, path: String,
                     ranges: String): DataFrame = {
    val rs = graft.util.Ranges.parse(ranges)
    val cond = rs.map { case (s, e) => col("start") >= s && col("start") < e }
      .reduceOption(_ || _).getOrElse(lit(false))
    blocks(spark, path).filter(cond)
  }

  private[ops] def readContigLens(path: String): IndexedSeq[Int] =
    readContigs(path).map(_._2)

  /** The typed face of the bam source: `Dataset[BamRead]` (fields resolve
    * by name; pruning still applies to columns the caller projects). */
  def readsDS(spark: SparkSession, path: String,
              options: Map[String, String] = Map.empty): Dataset[graft.bam.BamRead] = {
    import spark.implicits._
    spark.read.format("bam").options(options).load(path).as[graft.bam.BamRead]
  }

  /** Header contig dictionary: (name, length) in refIdx order. */
  def readContigs(path: String): IndexedSeq[(String, Int)] = {
    val blocks = new BlockReader(
      SeekableInput.open(path, graft.bam.ds.BamDataSource.hadoopConf()))
    try {
      val r = new graft.bam.io.UncompressedReader(blocks)
      r.seek(Pos(0, 0))
      graft.bam.codec.Bam.readHeader(r).contigs.map(c => c.name -> c.length)
    } finally blocks.close()
  }
}
