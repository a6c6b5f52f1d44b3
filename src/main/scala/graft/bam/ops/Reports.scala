package graft.bam.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Bytes

/** Text reports with the reference CLI's golden-output shape
  * (cli/src/test/resources/output/full-check and …/check-bam files): the
  * four header stat lines, the match/false-positive verdict, flag-count
  * sections with per-position "succeeding read" descriptions, histograms,
  * and right-aligned per-flag total tables.
  *
  * Everything data-sized stays a distributed plan (FullCheckOps.fullCalls,
  * BamOps.records, the bam source); only the ≤10-line position samples and
  * the per-flag tables are collected. The succeeding-read lookup for the
  * sampled positions is ONE broadcast join of the tiny sample against the
  * bam source — not a per-position scan.
  */
object Reports {

  /** The reference's `full-check` report (FullCheck.scala driver output):
    * header stats, full-checker-vs-truth verdict, the exactly-one / two
    * flag sections, and the all-positions per-flag error totals. */
  def fullCheckReport(spark: SparkSession, path: String,
                      numPartitions: Int = 8,
                      printLimit: Int = 1000): String = {
    val calls = FullCheckOps.fullCalls(spark, path, numPartitions)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val truth = BamOps.records(spark, path)
      val sb = new StringBuilder
      sb ++= header(spark, path)

      val verdict = calls
        .join(truth.withColumn("isRecord", lit(true)),
          Seq("blockPos", "offset"), "left")
        .select(col("ok"), coalesce(col("isRecord"), lit(false)).as("t"))
        .groupBy("ok", "t").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
        .toMap
      val fp = verdict.getOrElse((true, false), 0L)
      val fn = verdict.getOrElse((false, true), 0L)
      sb ++= matchLine(fp, fn) + "\n"

      sb ++= flagCountSection(spark, path, calls, numFlags = 1, printLimit)
      sb ++= flagCountSection(spark, path, calls, numFlags = 2, printLimit)

      sb ++= "\nTotal error counts:\n"
      val totals = calls.filter(col("numFlags") > 0)
        .select(explode(col("flags")).as("flag"))
        .groupBy("flag").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("flag"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      sb ++= table(totals, indent = "\t")
      sb.result()
    } finally calls.unpersist()
  }

  /** The reference's `check-bam` report: header stats, the
    * checker-vs-truth verdict, and — when there are false positives — the
    * FP-site flags histogram plus per-site succeeding-read lines (the full
    * checker's flags explain WHY each site is record-like). */
  def checkBamReport(spark: SparkSession, path: String,
                     checker: String = "eager",
                     numPartitions: Int = 8,
                     printLimit: Int = 1000): String = {
    val calls = BamOps.checkerCalls(spark, path, numPartitions)
    val truth = BamOps.records(spark, path)
    val callCol = if (checker == "relaxed") col("relaxedCall") else col("eagerCall")
    val joined = calls
      .join(truth.withColumn("isRecord", lit(true)),
        Seq("blockPos", "offset"), "left")
      .select(col("blockPos"), col("offset"), callCol.as("call"),
        coalesce(col("isRecord"), lit(false)).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sb = new StringBuilder
      sb ++= header(spark, path)
      val verdict = joined.groupBy("call", "t").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
        .toMap
      val fp = verdict.getOrElse((true, false), 0L)
      val fn = verdict.getOrElse((false, true), 0L)
      sb ++= matchLine(fp, fn) + "\n"

      if (fp > 0) {
        // the FULL checker's flags at the FP sites explain the confusion.
        // FP sets can be data-sized on adversarial inputs: the join is a
        // plain equi-join (AQE picks the strategy), the histogram stays a
        // distributed aggregate, and only ≤10 sample rows are collected.
        val fpPos = joined.filter(col("call") && !col("t"))
          .select("blockPos", "offset")
        // "none" = the site IS a record start that truth disagrees on
        val fpFlags = FullCheckOps.fullCalls(spark, path, numPartitions)
          .join(fpPos, Seq("blockPos", "offset"))
          .select(col("blockPos"), col("offset"),
            when(size(col("flags")) === 0, lit("none"))
              .otherwise(concat_ws(",", col("flags"))).as("flagset"),
            col("readsBeforeError"))

        sb ++= "\nFalse-positive-site flags histogram:\n"
        // flag SETS are few in practice but unbounded in theory — cap the
        // driver collect with the reference's print-limit idiom
        // (docs/command-line.md:90-98), "…" marking the cut
        val fpHist = fpFlags.groupBy("flagset").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("flagset"))
          .limit(printLimit + 1).collect()
        fpHist.take(printLimit)
          .foreach(r => sb ++= s"\t${r.getLong(1)}:\t${r.getString(0)}\n")
        if (fpHist.length > printLimit) sb ++= "\t…\n"

        sb ++= "\nFalse positives with succeeding read info:\n"
        val sample = fpFlags.orderBy("blockPos", "offset").limit(10)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getString(2)))
        val reads = succeedingReads(spark, path,
          sample.map(s => (s._1, s._2)).toSeq)
        sample.foreach { case (b, o, k, fs) =>
          sb ++= s"\t$b:$o:\t$k before ${reads.getOrElse((b, o), "end of file")}." +
            s" Failing checks: $fs\n"
        }
        if (fp > 10) sb ++= "\t…\n"
      }
      sb.result()
    } finally joined.unpersist()
  }

  // ---- shared pieces -----------------------------------------------------

  /** "N uncompressed positions / <size> compressed / ratio / M reads". */
  private def header(spark: SparkSession, path: String): String = {
    val bl = BamOps.blocks(spark, path)
      .agg(sum("uncompressedSize").as("u"), sum("compressedSize").as("c"))
      .collect()(0)
    val (u, c) = (bl.getLong(0), bl.getLong(1))
    val reads = BamOps.records(spark, path).count()
    s"$u uncompressed positions\n" +
      s"${Bytes.formatShort(c)} compressed\n" +
      f"Compression ratio: ${u.toDouble / c}%.2f\n" +
      s"$reads reads\n"
  }

  private def matchLine(fp: Long, fn: Long): String =
    if (fp == 0 && fn == 0) "All calls matched!"
    else s"$fp false positives, $fn false negatives"

  /** One "positions where exactly K checks failed" section: sample lines
    * with succeeding-read info, flag-set histogram, per-flag totals. */
  private def flagCountSection(spark: SparkSession, path: String,
                               calls: DataFrame, numFlags: Int,
                               printLimit: Int = 1000): String = {
    val phrase =
      if (numFlags == 1) "one check failed"
      else s"${numWord(numFlags)} checks failed"
    val sub = calls.filter(col("numFlags") === numFlags)
    val n = sub.count()
    if (n == 0)
      s"\nNo positions where ${if (numFlags == 1) "only" else "exactly"} $phrase\n"
    else {
      val sb = new StringBuilder
      val shown = math.min(10, n)
      sb ++= s"\n$shown of $n positions where exactly $phrase:\n"
      val sample = sub.orderBy("blockPos", "offset").limit(10)
        .select(col("blockPos"), col("offset"), col("readsBeforeError"),
          concat_ws(",", col("flags")).as("fs"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      val reads = succeedingReads(spark, path,
        sample.map(s => (s._1, s._2)).toSeq)
      sample.foreach { case (b, o, k, fs) =>
        sb ++= s"\t$b:$o:\t$k before ${reads.getOrElse((b, o), "end of file")}." +
          s" Failing checks: $fs\n"
      }
      if (n > shown) sb ++= "\t…\n"

      sb ++= "\n\tHistogram:\n"
      val hist = sub.groupBy(concat_ws(",", col("flags")).as("fs"))
        .agg(count(lit(1)).as("n")).orderBy(desc("n"), col("fs"))
        .limit(printLimit + 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      hist.take(printLimit).foreach { case (fs, c) => sb ++= s"\t\t$c:\t$fs\n" }
      if (hist.length > printLimit) sb ++= "\t\t…\n"

      sb ++= "\n\tPer-flag totals:\n"
      val totals = sub.select(explode(col("flags")).as("flag"))
        .groupBy("flag").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("flag"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      sb ++= table(totals, indent = "\t\t")
      sb.result()
    }
  }

  /** Right-aligned name/count table (the reference's per-flag layouts). */
  private def table(rows: Seq[(String, Long)], indent: String): String = {
    if (rows.isEmpty) return ""
    val nameW = rows.map(_._1.length).max
    val countW = rows.map(_._2.toString.length).max
    rows.map { case (name, c) =>
      val pn = " " * (nameW - name.length) + name
      val pc = " " * (countW - c.toString.length) + c
      s"$indent$pn:\t$pc\n"
    }.mkString
  }

  private def numWord(n: Int): String = n match {
    case 1 => "one"
    case 2 => "two"
    case 3 => "three"
    case _ => n.toString
  }

  /** For each queried (blockPos, offset): the description of the first
    * record starting at-or-after it — `name 1/2 101b aligned read @
    * ctg:pos` / `… unmapped read (placed at ctg:pos)` (1-based display,
    * reference PosMetadata show). One broadcast join, one pass. */
  private def succeedingReads(spark: SparkSession, path: String,
                              posns: Seq[(Long, Int)]): Map[(Long, Int), String] = {
    if (posns.isEmpty) return Map.empty
    import spark.implicits._
    val pts = posns.toDF("qb", "qo")
      .withColumn("qv", shiftleft(col("qb"), 16).bitwiseOR(col("qo").cast("long")))
    val reads = spark.read.format("bam").load(path)
      .select(col("readName"), col("flags"), length(col("seq")).as("len"),
        col("contig"), col("pos"),
        shiftleft(col("virtualPos.blockPos"), 16)
          .bitwiseOR(col("virtualPos.offset").cast("long")).as("rv"))
    reads.join(broadcast(pts), col("rv") >= col("qv"))
      .groupBy("qb", "qo")
      .agg(min_by(struct(col("readName"), col("flags"), col("len"),
        col("contig"), col("pos")), col("rv")).as("r"))
      .collect()
      .map { row =>
        val r = row.getStruct(2)
        val flags = r.getInt(1)
        val mate =
          if ((flags & 1) == 0) ""
          else if ((flags & 0x40) != 0) "1/2 "
          else if ((flags & 0x80) != 0) "2/2 "
          else ""
        val place = s"${Option(r.getString(3)).getOrElse("*")}:${r.getInt(4) + 1}"
        val desc =
          if ((flags & 4) != 0)
            s"${r.getString(0)} $mate${r.getInt(2)}b unmapped read (placed at $place)"
          else
            s"${r.getString(0)} $mate${r.getInt(2)}b aligned read @ $place"
        (row.getLong(0), row.getInt(1)) -> desc
      }.toMap
  }
}
