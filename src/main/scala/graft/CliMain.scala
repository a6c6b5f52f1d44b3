package graft

import org.apache.spark.sql.SparkSession

import graft.bam.ops.{BamOps, BamSink, Reports, SplitReports, SplitTiming}

/** Thin CLI front-end mirroring the reference's subcommand surface
  * (reference cli/src/main/scala/org/hammerlab/bam/Main.scala:19-28):
  * `check-bam`, `check-blocks`, `count-reads`, `time-load`, `full-check`,
  * `compare-splits`, `compute-splits`, `index-blocks`, `index-records`,
  * `htsjdk-rewrite` — each mapped onto the library's existing
  * report/query functions (the same ones the registered queries and the
  * golden-pinned ReportsSpec exercise). Flag parsing is hand-rolled: the
  * offline environment pins the dependency set (no caseapp), and ten
  * subcommands share four flags.
  *
  * Run: `sbt "runMain graft.Main check-bam <path.bam>"`, or
  * `spark-submit --class graft.Main <jar> <cmd> ...` on a cluster.
  */
object Main {

  private val usage =
    """usage: graft.Main <command> [options] <path> [<path>...]
      |
      |commands (reference-CLI parity):
      |  check-bam      <bam>          checker-vs-truth report (--checker eager|relaxed)
      |  full-check     <bam>          full (flag-level) checker report
      |  check-blocks   <bam>          per-block first-record check table
      |  count-reads    <bam>...       read count per file
      |  time-load      <bam>          eager-vs-relaxed load race summary
      |  compute-splits <bam>          split start positions (--split-size N)
      |  compare-splits <bam>...       eager/relaxed split diff + timing report
      |  index-blocks   <bam>          write the .blocks side-car (-o <out>)
      |  index-records  <bam>          write the .records side-car (-o <out>)
      |  htsjdk-rewrite <in> <out>     rewrite a BAM (--range lo:hi keeps records (lo,hi])
      |
      |options:
      |  -o <path>            write report/table output to a file (default stdout)
      |  --checker <name>     check-bam checker profile: eager (default) | relaxed
      |  --split-size <n>     byte split size (default 65536)
      |  --num-partitions <n> partitions for check jobs (default 8)
      |  --range <lo:hi>      htsjdk-rewrite record-index range, 0-based exclusive/inclusive
      |  -b                   htsjdk-rewrite: also write the output's .blocks side-car
      |  -i                   htsjdk-rewrite: also write the output's .records side-car
      |  --bai                htsjdk-rewrite: also build the output's standard .bai
      |  -s                   compute-splits: eager algorithm only
      |  -u                   compute-splits: relaxed algorithm only
      |  -p                   compute-splits: also print per-split record-count stats
      |  -n <k>               count-reads: repeat k times, report timing stats
      |  --tsv                emit the machine-readable table instead of the text report
      |""".stripMargin

  private final case class Opts(out: Option[String] = None,
                                checker: String = "eager",
                                splitSize: Long = 65536L,
                                numPartitions: Int = 8,
                                range: Option[(Long, Long)] = None,
                                eagerOnly: Boolean = false,
                                relaxedOnly: Boolean = false,
                                partitionStats: Boolean = false,
                                iterations: Int = 1,
                                tsv: Boolean = false,
                                idxBlocks: Boolean = false,
                                idxRecords: Boolean = false,
                                idxBai: Boolean = false,
                                paths: Vector[String] = Vector.empty)

  @annotation.tailrec
  private def parse(args: List[String], o: Opts): Opts = args match {
    case Nil => o
    case "-o" :: v :: rest => parse(rest, o.copy(out = Some(v)))
    case "--checker" :: v :: rest => parse(rest, o.copy(checker = v))
    case "--split-size" :: v :: rest => parse(rest, o.copy(splitSize = v.toLong))
    case "--num-partitions" :: v :: rest => parse(rest, o.copy(numPartitions = v.toInt))
    case "--range" :: v :: rest =>
      val Array(lo, hi) = v.split(":", 2)
      parse(rest, o.copy(range = Some((lo.toLong, hi.toLong))))
    case "-s" :: rest => parse(rest, o.copy(eagerOnly = true))
    case "-u" :: rest => parse(rest, o.copy(relaxedOnly = true))
    case "-p" :: rest => parse(rest, o.copy(partitionStats = true))
    case "-n" :: v :: rest => parse(rest, o.copy(iterations = v.toInt))
    case "--tsv" :: rest => parse(rest, o.copy(tsv = true))
    case "-b" :: rest => parse(rest, o.copy(idxBlocks = true))
    case "-i" :: rest => parse(rest, o.copy(idxRecords = true))
    case "--bai" :: rest => parse(rest, o.copy(idxBai = true))
    case flag :: _ if flag.startsWith("-") =>
      throw new IllegalArgumentException(s"unknown option $flag")
    case p :: rest => parse(rest, o.copy(paths = o.paths :+ p))
  }

  private var sparkStarted = false
  private lazy val spark: SparkSession = {
    sparkStarted = true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0") // see Bench.scala
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** TSV rendering for table-shaped results (column header + rows). */
  private def tsv(df: org.apache.spark.sql.DataFrame): String =
    (df.columns.mkString("\t") +:
      df.collect().toSeq.map(_.toSeq.map(String.valueOf).mkString("\t")))
      .mkString("", "\n", "\n")

  private def emit(text: String, o: Opts): Unit = o.out match {
    case Some(p) => java.nio.file.Files.writeString(java.nio.file.Paths.get(p), text)
    case None => print(text)
  }

  def run(cmd: String, o: Opts): Unit = cmd match {
    case "check-bam" =>
      require(o.paths.size == 1, "check-bam takes exactly one BAM")
      emit(Reports.checkBamReport(spark, o.paths.head, o.checker, o.numPartitions), o)
    case "full-check" =>
      require(o.paths.size == 1, "full-check takes exactly one BAM")
      emit(Reports.fullCheckReport(spark, o.paths.head, o.numPartitions), o)
    case "check-blocks" =>
      require(o.paths.size == 1, "check-blocks takes exactly one BAM")
      if (o.tsv) emit(tsv(BamOps.checkBlocks(spark, o.paths.head, o.numPartitions)), o)
      else emit(SplitReports.checkBlocksReport(spark, o.paths.head, o.numPartitions), o)
    case "count-reads" =>
      require(o.paths.nonEmpty, "count-reads takes one or more BAMs")
      if (o.tsv || o.paths.size > 1)
        emit(o.paths.map(p =>
          s"$p\t${spark.read.format("bam").load(p).count()}")
          .mkString("", "\n", "\n"), o)
      else emit(SplitReports.countReadsReport(spark, o.paths.head, o.splitSize,
        o.iterations), o)
    case "time-load" =>
      require(o.paths.size == 1, "time-load takes exactly one BAM")
      if (o.tsv) emit(tsv(SplitTiming.timeLoad(spark, o.paths.head, o.splitSize)), o)
      else emit(SplitReports.timeLoadReport(spark, o.paths.head, o.splitSize), o)
    case "compute-splits" =>
      require(o.paths.size == 1, "compute-splits takes exactly one BAM")
      if (o.tsv) emit(tsv(BamOps.splits(spark, o.paths.head, o.splitSize)), o)
      else {
        // -p: realized per-split record counts through the DSv2 source —
        // a thunk, so the scan only runs if the report prints the stats
        val counts =
          if (!o.partitionStats) None
          else Some(() => BamOps.splits(spark, o.paths.head, o.splitSize)
            .orderBy("split").select("numRecords")
            .collect().toSeq.map(_.getLong(0)))
        emit(SplitReports.computeSplitsReport(o.paths.head, o.splitSize,
          o.eagerOnly, o.relaxedOnly, counts), o)
      }
    case "compare-splits" =>
      require(o.paths.nonEmpty, "compare-splits takes one or more BAMs")
      import spark.implicits._
      val results = SplitTiming
        .compareSplits(spark, o.paths, o.splitSize)
        .as[SplitTiming.Result].collect().toSeq
      emit(SplitTiming.report(results), o)
    case "index-blocks" =>
      require(o.paths.size == 1, "index-blocks takes exactly one BAM")
      val out = o.out.getOrElse(o.paths.head + ".blocks")
      BamOps.indexBlocks(spark, o.paths.head, out)
      println(s"wrote $out")
    case "index-records" =>
      require(o.paths.size == 1, "index-records takes exactly one BAM")
      val out = o.out.getOrElse(o.paths.head + ".records")
      BamOps.indexRecords(spark, o.paths.head, out)
      println(s"wrote $out")
    case "htsjdk-rewrite" =>
      require(o.paths.size == 2, "htsjdk-rewrite takes <in> <out>")
      BamSink.rewrite(spark, o.paths(0), o.paths(1), o.range,
        index = o.idxBai, indexBlocks = o.idxBlocks, indexRecords = o.idxRecords)
      println(s"wrote ${o.paths(1)}")
    case other =>
      throw new IllegalArgumentException(s"unknown command '$other'")
  }

  /** Parse + dispatch without JVM/session teardown (test entry point —
    * under a running test session, getOrCreate reuses it). */
  private[graft] def runArgs(args: Seq[String]): Unit =
    run(args.head, parse(args.toList.tail, Opts()))

  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args.head == "--help" || args.head == "-h") {
      System.err.println(usage)
      sys.exit(if (args.isEmpty) 2 else 0)
    }
    try runArgs(args.toSeq)
    catch {
      case e: IllegalArgumentException =>
        System.err.println(s"error: ${e.getMessage}\n\n$usage")
        sys.exit(2)
    }
    if (sparkStarted) spark.stop()
  }
}
