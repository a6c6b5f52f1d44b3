package graft.bam.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bam.codec.Pos
import graft.util.{Bytes, Stats}

/** Reference-CLI-shaped text reports for the split/throughput subcommands —
  * compute-splits, count-reads, time-load, check-blocks (reference output
  * formats: cli/.../spark/ComputeSplits.scala:58-154 + ComputeSplitsTest
  * .scala:15-100 line shapes, compare/CountReads.scala:85-105,
  * compare/TimeLoad.scala:70-98, check/blocks/CheckBlocks.scala:120-195).
  *
  * The reference races spark-bam against hadoop-bam; offline we race the
  * same algorithm pair under their profile names: `eager` (spark-bam's
  * checker) vs `relaxed` (the documented hadoop-bam profile) — so every
  * "spark-bam"/"hadoop-bam" label becomes "eager"/"relaxed".
  *
  * Everything data-sized stays distributed (the bam source, the block
  * catalog); only per-partition first reads, ≤print-limit mismatch rows,
  * and the ≤65536-bucket offset histogram reach the driver — each bounded
  * by structure, not data size.
  */
object SplitReports {

  private def timedMs[A](body: => A): (Long, A) = {
    val t0 = System.nanoTime()
    val a = body
    (math.max(1L, (System.nanoTime() - t0) / 1000000), a)
  }

  /** One algorithm's realized split layout: (start, end) position pairs.
    * End = next split's start; the last split closes at (fileLength, 0) —
    * the reference's terminal-split shape (`…-597482:0`). */
  def splitLayout(path: String, splitSize: Long, relaxed: Boolean,
                  conf: org.apache.hadoop.conf.Configuration =
                    new org.apache.hadoop.conf.Configuration())
      : Vector[(Pos, Pos)] = {
    val starts = SplitTiming.computeSplits(path, splitSize, relaxed, conf = conf)
    if (starts.isEmpty) Vector.empty
    else {
      val ends = starts.tail :+ Pos(graft.bam.ds.Bai.fileLen(path), 0)
      starts.zip(ends)
    }
  }

  /** Estimated split length: compressed-byte span with the offset delta
    * folded in — our deterministic analog of the reference's
    * EstimatedCompressionRatio-scaled `end - start` (check/.../Split
    * .scala:10-12; exact values there depend on a measured ratio, so only
    * the SHAPE is reproduced). */
  private def splitLen(s: (Pos, Pos)): Double =
    (s._2.blockPos - s._1.blockPos).toDouble + (s._2.offset - s._1.offset)

  /** "Split-size distribution:" Stats + "N splits:" list — the tail every
    * single-algorithm compute-splits run prints. */
  private def printSplits(splits: Seq[(Pos, Pos)]): String = {
    val sb = new StringBuilder
    sb ++= "Split-size distribution:\n"
    sb ++= Stats(splits.map(splitLen)).toString
    sb ++= "\n\n"
    sb ++= s"${splits.length} splits:\n"
    splits.foreach { case (s, e) => sb ++= s"\t$s-$e\n" }
    sb.result()
  }

  /** compute-splits: run eager and/or relaxed (both → diff them), timing
    * line(s) first, reference line shapes throughout. `partitionCounts`
    * (the `-p` option) appends "Partition count stats:" over the realized
    * per-split record counts — a THUNK, because the counts cost a full
    * record scan and the compare mode's splits-differ branch (like the
    * reference's) never prints them. */
  def computeSplitsReport(path: String, splitSize: Long,
                          eagerOnly: Boolean = false,
                          relaxedOnly: Boolean = false,
                          partitionCounts: Option[() => Seq[Long]] = None): String = {
    val conf = graft.bam.ds.BamDataSource.hadoopConf()
    def partStats: String = partitionCounts.fold("") { counts =>
      s"Partition count stats:\n${Stats(counts().map(_.toDouble))}\n"
    }
    (eagerOnly, relaxedOnly) match {
      case (true, false) =>
        val (ms, splits) = timedMs(splitLayout(path, splitSize, relaxed = false, conf))
        s"Get eager splits: ${ms}ms\n\n" + printSplits(splits) + partStats
      case (false, true) =>
        val (ms, splits) = timedMs(splitLayout(path, splitSize, relaxed = true, conf))
        s"Get relaxed splits: ${ms}ms\n\n" + printSplits(splits) + partStats
      case _ =>
        val (eMs, eager) = timedMs(splitLayout(path, splitSize, relaxed = false, conf))
        val (rMs, relax) = timedMs(splitLayout(path, splitSize, relaxed = true, conf))
        val sb = new StringBuilder
        sb ++= s"Get eager splits: ${eMs}ms\n"
        sb ++= s"Get relaxed splits: ${rMs}ms\n\n"
        val es = eager.toSet
        val rs = relax.toSet
        // merged diff, sorted by start position: eager-only rows indent one
        // tab, relaxed-only two (the reference's ours/theirs layout)
        val diffs =
          (eager.filterNot(rs).map(s => (s._1, s"\t${s._1}-${s._2}")) ++
            relax.filterNot(es).map(s => (s._1, s"\t\t${s._1}-${s._2}")))
            .sortBy(_._1)
        if (diffs.nonEmpty) {
          sb ++= s"${diffs.length} splits differ (totals: ${eager.length}, ${relax.length}):\n"
          diffs.foreach { case (_, line) => sb ++= line + "\n" }
        } else {
          sb ++= "All splits matched!\n\n"
          sb ++= printSplits(eager)
          sb ++= partStats
        }
        sb.result()
    }
  }

  /** count-reads: race the two checker profiles through the bam source's
    * distributed count, then the matched/mismatched verdict line. With
    * `iterations > 1`, the reference's multi-run shape: per-profile
    * timing Stats then the count verdict (CountReads.scala Results
    * rendering, `-n` option). */
  def countReadsReport(spark: SparkSession, path: String,
                       splitSize: Long, iterations: Int = 1): String = {
    require(iterations > 0, s"Invalid numIterations: $iterations")
    def countVia(checker: String): (Long, Long) = timedMs {
      spark.read.format("bam")
        .option("splitSize", splitSize.toString)
        .option("checker", checker)
        .load(path)
        .count()
    }
    def verdict(e: Long, r: Long): String =
      if (e == r) s"Read counts matched: $e\n"
      else s"Read counts mismatched: $e via eager, $r via relaxed\n"
    if (iterations == 1) {
      val (eMs, e) = countVia("eager")
      val (rMs, r) = countVia("relaxed")
      s"eager read-count time: $eMs\n" +
        s"relaxed read-count time: $rMs\n\n" + verdict(e, r)
    } else {
      val runs = (0 until iterations).map(_ => (countVia("eager"), countVia("relaxed")))
      val eTimes = runs.map(_._1._1.toDouble)
      val rTimes = runs.map(_._2._1.toDouble)
      // count histograms, reference Results shape (one line when unanimous)
      val eCounts = runs.groupBy(_._1._2).view.mapValues(_.size).toMap
      val rCounts = runs.groupBy(_._2._2).view.mapValues(_.size).toMap
      val sb = new StringBuilder
      sb ++= s"eager times (ms):\n${Stats(eTimes)}\n\n"
      sb ++= s"relaxed times (ms):\n${Stats(rTimes)}\n\n"
      (eCounts.toSeq, rCounts.toSeq) match {
        case (Seq((e, _)), Seq((r, _))) => sb ++= verdict(e, r)
        case _ =>
          sb ++= "eager read-counts:\n"
          eCounts.toSeq.sorted.foreach { case (c, n) => sb ++= s"\t$c ($n runs)\n" }
          sb ++= "\nrelaxed read-counts:\n"
          rCounts.toSeq.sorted.foreach { case (c, n) => sb ++= s"\t$c ($n runs)\n" }
      }
      sb.result()
    }
  }

  /** time-load: collect every partition's first read name through both
    * loaders, timed, and diff the name sets (race kernel shared with
    * [[SplitTiming.timeLoad]]). */
  def timeLoadReport(spark: SparkSession, path: String,
                     splitSize: Long): String = {
    val (eMs, eager) = SplitTiming.firstNames(spark, path, splitSize, "eager")
    val (rMs, relaxed) = SplitTiming.firstNames(spark, path, splitSize, "relaxed")
    val sb = new StringBuilder
    sb ++= s"eager first-read collection time: $eMs\n"
    sb ++= s"relaxed first-read collection time: $rMs\n\n"
    val es = eager.toSet
    val rs = relaxed.toSet
    val onlyEager = es.diff(rs)
    val onlyRelaxed = rs.diff(es)
    if (onlyEager.nonEmpty) {
      sb ++= s"eager returned ${onlyEager.size} unmatched partition-start reads:\n"
      sb ++= onlyEager.toSeq.sorted.mkString("\t", "\n\t", "\n")
    }
    if (onlyRelaxed.nonEmpty) {
      sb ++= s"relaxed returned ${onlyRelaxed.size} unmatched partition-start reads:\n"
      sb ++= onlyRelaxed.toSeq.sorted.mkString("\t", "\n\t", "\n")
    }
    if (onlyEager.isEmpty && onlyRelaxed.isEmpty)
      sb ++= s"All ${eager.length} partition-start reads matched\n"
    sb.result()
  }

  /** check-blocks: per-block first-read-position verdict totals plus the
    * blocks'-first-read-offset summary; on mismatches, the bad-block lines
    * with the previous block's compressed size (the reference's
    * bad-split-probability numerator). */
  def checkBlocksReport(spark: SparkSession, path: String,
                        numPartitions: Int = 8,
                        printLimit: Int = 1000): String = {
    val checked = BamOps.checkBlocks(spark, path, numPartitions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totalCompressedSize = graft.bam.ds.Bai.fileLen(path)
      val numBlocks = checked.count()
      val sb = new StringBuilder

      // Option[offset]-keyed histogram of each block's own first read
      // start: ≤65537 buckets by construction (16-bit offsets), so the
      // collect is bounded however many blocks exist.
      val offHist: Map[Option[Int], Long] = checked
        .groupBy("firstOffsetInBlock").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0))) -> r.getLong(1))
        .toMap
      def offsetsInfo(): Unit = offHist.keySet.toVector.sortBy(_.getOrElse(-1)) match {
        case Vector() => // empty file: no blocks, nothing to summarize
        case Vector(None) => // legal header-only BAM: blocks but no reads
          sb ++= s"\n${offHist(None)} blocks didn't contain a read\n"
        case Vector(None, Some(0)) =>
          sb ++= s"\n${offHist(Some(0))} blocks start with a read, ${offHist(None)} blocks didn't contain a read\n"
        case Vector(Some(0)) =>
          sb ++= "\nAll blocks start with reads\n"
        case _ =>
          val nonEmpty = offHist.collect { case (Some(k), v) => k -> v }
          sb ++= s"\nOffsets of blocks' first reads (${offHist.getOrElse(None, 0L)} blocks didn't contain a read start):\n"
          sb ++= histStats(nonEmpty) + "\n"
      }

      val numWrongBlocks = checked.filter(!col("matches")).count()
      if (numWrongBlocks == 0) {
        sb ++= s"First read-position matched in $numBlocks BGZF blocks totaling ${Bytes.format(totalCompressedSize)} (compressed)\n"
        offsetsInfo()
      } else {
        // numerator of the reference's bad-split probability: compressed
        // bytes whose containing split boundary would mis-resolve = the
        // PREVIOUS block's size for each mismatched block
        val prevSized = graft.ops.ScalableWindow.lag1(
          BamOps.blocks(spark, path).select(col("start"), col("compressedSize")),
          Seq("start"), "compressedSize", "prevSize")
        val bad = checked.filter(!col("matches"))
          .join(prevSized.select(col("start"), col("prevSize")), "start")
        val wrongBytes = bad
          .agg(sum(coalesce(col("prevSize"), lit(1))).as("s"))
          .collect()(0).getLong(0)
        sb ++= s"First read-position mismatched in $numWrongBlocks of $numBlocks BGZF blocks\n\n"
        sb ++= s"$wrongBytes of $totalCompressedSize (${wrongBytes * 1.0 / totalCompressedSize}) compressed positions would lead to bad splits\n"
        offsetsInfo()
        sb ++= "\n"
        val shown = bad.orderBy("start")
          .select(col("start"), coalesce(col("prevSize"), lit(1)).as("sz"),
            col("eagerBlock"), col("eagerOffset"),
            col("truthBlock"), col("truthOffset"))
          .limit(printLimit + 1).collect()
        def posOf(b: Long, o: Int): String = if (b < 0) "-" else s"$b:$o"
        if (shown.length > printLimit)
          sb ++= s"First $printLimit of $numWrongBlocks mismatched blocks:\n"
        else
          sb ++= s"$numWrongBlocks mismatched blocks:\n"
        shown.take(printLimit).foreach { r =>
          sb ++= s"\t${r.getLong(0)} (prev block size: ${r.getInt(1)}):" +
            s"\t${posOf(r.getLong(2), r.getInt(3))}\t${posOf(r.getLong(4), r.getInt(5))}\n"
        }
      }
      sb.result()
    } finally checked.unpersist()
  }

  /** Weighted Stats header + collapsed elems line straight from a
    * (value → count) histogram — numBlocks-independent, unlike expanding
    * the counts into a Seq (reference Stats.fromHist's role). */
  private def histStats(hist: Map[Int, Long]): String = {
    val n = hist.values.sum
    val mean = hist.map { case (k, c) => k.toDouble * c }.sum / n
    val varSum = hist.map { case (k, c) => (k - mean) * (k - mean) * c }.sum
    val std = math.sqrt(varSum / n)
    def weightedQuantile(p: Double): Double = {
      val target = p * (n - 1)
      var acc = 0L
      for ((k, c) <- hist.toSeq.sortBy(_._1)) {
        if (acc + c > target) return k.toDouble
        acc += c
      }
      hist.keys.max.toDouble
    }
    val med = weightedQuantile(0.5)
    val madHist = hist.groupMapReduce { case (k, _) =>
      math.abs(k - med).round.toInt }(_._2)(_ + _)
    def fmt(d: Double): String =
      if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else f"$d%.1f"
    val madMed = {
      val target = 0.5 * (n - 1)
      var acc = 0L
      var res = madHist.keys.max.toDouble
      var done = false
      for ((k, c) <- madHist.toSeq.sortBy(_._1) if !done) {
        if (acc + c > target) { res = k.toDouble; done = true }
        acc += c
      }
      res
    }
    val elems = hist.toSeq.sortBy(_._1).take(20)
      .map { case (k, c) => if (c > 1) s"$k×$c" else s"$k" }
    val elemsLine = (if (hist.size > 20) elems :+ "…" else elems).mkString(" ")
    s"N: $n, μ/σ: ${fmt(mean)}/${fmt(std)}, med/mad: ${fmt(med)}/${fmt(madMed)}\n elems: $elemsLine"
  }
}
