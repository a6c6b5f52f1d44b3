package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics manifest + listing-time data skipping —
  * the Delta/Iceberg "stats in the transaction log" pattern expressed as
  * plain Spark over plain parquet.
  *
  * Parquet footers already carry row-group min/max, but at 100 TB the
  * footer is the wrong place to prune from: a million-file corpus costs a
  * million footer reads (object-store GETs) before the first row group is
  * skipped. A MANIFEST — one small parquet table of `(file, rows,
  * min/max per indexed column)` — moves that decision to the driver's
  * file listing: a range predicate consults the manifest (KB, one read)
  * and hands Spark only the files whose `[min, max]` intersects the
  * query box. Combined with a clustered write (range-partitioned 1-D
  * sort, or [[LayoutOps.writeZOrdered]] for 2-D), per-file ranges are
  * tight and a selective query opens a handful of files out of millions.
  *
  * Design points:
  *  - The manifest lives under `<path>/_graft_stats`. Leading-underscore
  *    paths are invisible to Spark's parquet listing, so data readers
  *    that don't know about stats are unaffected.
  *  - Skipping is CONSERVATIVE: a data file present on disk but absent
  *    from the manifest (e.g. appended by a writer that doesn't maintain
  *    stats) is always read. Stale stats can therefore never drop rows —
  *    the manifest is an accelerator, not a correctness dependency.
  *  - [[appendWithStats]] maintains the manifest INCREMENTALLY: only the
  *    newly written files are re-read for stats (cost ∝ the append, never
  *    the corpus) and their rows are appended to the manifest.
  *  - Row-level residual: [[readSkipping]] re-applies the range predicate
  *    to the surviving files' rows, so a file that merely OVERLAPS the
  *    box contributes only its in-box rows. Equal results with a full
  *    scan + filter is the gate (`layout_skipping`); file-count pruning
  *    is asserted in StatsSkippingSpec.
  *
  * The reference engine has no analog (its pruning is the BAI/GRI
  * interval index over genomic coordinates — see
  * reference load/src/main/scala/org/hammerlab/bam/spark/load/
  * CanLoadBam.scala's intervals path); this is the same idea generalized
  * to arbitrary columns of a curated corpus.
  */
object StatsOps {

  /** Inclusive range predicate on one indexed column; `None` = unbounded. */
  final case class ColRange(name: String, lo: Option[Any], hi: Option[Any]) {
    def rowPredicate: Column = {
      val c = col(name)
      (lo, hi) match {
        case (Some(a), Some(b)) => c >= lit(a) && c <= lit(b)
        case (Some(a), None)    => c >= lit(a)
        case (None, Some(b))    => c <= lit(b)
        case (None, None)       => lit(true)
      }
    }
  }

  private def statsDir(path: String) = s"$path/_graft_stats"

  private def fileName(c: Column): Column = substring_index(c, "/", -1)

  private def statsAggs(statsCols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +: statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }

  /** Build (overwrite) the manifest for every parquet file under `path`:
    * one manifest row per data file with row count and min/max of each
    * `statsCols` entry. One distributed pass over the data — run it once
    * after a bulk [[LayoutOps.writeZOrdered]]/range-partitioned write;
    * incremental appends then go through [[appendWithStats]]. */
  def buildStats(spark: SparkSession, path: String,
                 statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "need at least one stats column")
    statsFor(spark.read.parquet(path), statsCols)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir(path))
  }

  /** Manifest rows key files by BASENAME, not absolute URI (Delta stores
    * log paths relative to the table root for the same reason): a store
    * that is copied or moved keeps a valid manifest, resolved against the
    * CURRENT `path` at read time. Basenames are unique within one
    * directory-shaped store (Spark part-file names embed a task UUID). */
  private def statsFor(df: DataFrame, statsCols: Seq[String]): DataFrame = {
    val aggs = statsAggs(statsCols)
    df.groupBy(fileName(input_file_name()).as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Clustered initial write: range-partition on `sortCols` (contiguous,
    * non-overlapping per-file ranges on the leading sort column — the
    * layout that makes min/max skipping effective) into ~`numFiles`
    * files, then build the manifest. */
  def writeWithStats(df: DataFrame, spark: SparkSession, path: String,
                     sortCols: Seq[String], statsCols: Seq[String],
                     numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    buildStats(spark, path, statsCols)
  }

  /** Manifest part-file count above which [[appendWithStats]] folds the
    * manifest back into one file. Each append adds one coalesce(1) part;
    * without compaction the "one small read" listing-time advantage
    * erodes linearly over a long-lived store's append history. */
  val ManifestCompactionThreshold = 16

  private def hasStats(spark: SparkSession, path: String): Boolean = {
    val p = new Path(statsDir(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append a batch as new clustered files and extend the manifest by
    * reading back ONLY the files this append created (set difference of
    * the listing against the manifest) — manifest maintenance cost is
    * proportional to the append, never to the store. Appending to a store
    * with no manifest yet bootstraps one over every file present (the
    * degenerate "all files are fresh" case). The manifest is compacted to
    * a single part once its own file count crosses
    * [[ManifestCompactionThreshold]]. */
  def appendWithStats(df: DataFrame, spark: SparkSession, path: String,
                      sortCols: Seq[String], statsCols: Seq[String],
                      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("append").parquet(path)
    spark.catalog.refreshByPath(path)
    val known: Set[String] =
      if (!hasStats(spark, path)) Set.empty
      else spark.read.parquet(statsDir(path))
        .select(fileName(col("file"))).distinct()
        .collect().map(_.getString(0)).toSet
    val fresh = listDataFiles(spark, path).filterNot(p => known(p.getName))
    if (fresh.nonEmpty)
      statsFor(spark.read.parquet(fresh.map(_.toString): _*), statsCols)
        .coalesce(1)
        .write.mode("append").parquet(statsDir(path))
    compactManifestIfNeeded(spark, path)
  }

  private def compactManifestIfNeeded(spark: SparkSession, path: String): Unit = {
    val dir = new Path(statsDir(path))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val parts = fs.listStatus(dir).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (parts > ManifestCompactionThreshold) {
      // localCheckpoint materializes the rows before the overwrite deletes
      // the files they came from (self-overwrite hazard); the manifest is
      // KB-scale so this is a driver-trivial operation.
      val m = spark.read.parquet(statsDir(path)).localCheckpoint(eager = true)
      m.coalesce(1).write.mode("overwrite").parquet(statsDir(path))
      spark.catalog.refreshByPath(statsDir(path))
    }
  }

  private def listDataFiles(spark: SparkSession, path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
  }

  /** The files a conjunction of ranges cannot rule out: manifest files
    * whose `[min, max]` intersects every range (null mins/maxes — an
    * all-null column chunk — survive conservatively), plus any data file
    * the manifest doesn't know about. Exposed for the spec's pruning
    * assertions. */
  def survivingFiles(spark: SparkSession, path: String,
                     ranges: Seq[ColRange]): Seq[String] = {
    val manifest = spark.read.parquet(statsDir(path))
    val keep = ranges.map { r =>
      val loOk = r.hi.map(b => col(s"min_${r.name}") <= lit(b)).getOrElse(lit(true))
      val hiOk = r.lo.map(a => col(s"max_${r.name}") >= lit(a)).getOrElse(lit(true))
      (loOk && hiOk) || col(s"min_${r.name}").isNull
    }.reduce(_ && _)
    // `file` is a basename (fileName() also tolerates pre-migration
    // absolute URIs); resolve against the CURRENT listing so the result
    // points into `path` even after a store copy/move, and a manifest row
    // whose file no longer exists on disk resolves to nothing.
    val onDisk: Map[String, String] =
      listDataFiles(spark, path).map(p => p.getName -> p.toString).toMap
    val fromManifest = manifest.filter(keep)
      .select(fileName(col("file"))).collect()
      .flatMap(r => onDisk.get(r.getString(0)))
    val known = manifest.select(fileName(col("file")))
      .collect().map(_.getString(0)).toSet
    val unknown = onDisk.collect { case (name, full) if !known(name) => full }
    (fromManifest ++ unknown).toIndexedSeq
  }

  /** Manifest-pruned range read: consult the manifest at the driver
    * (cost ∝ file count, not data), scan only the surviving files, and
    * re-apply the predicate row-level. Semantically identical to
    * `spark.read.parquet(path).filter(ranges)` — the gate proves it —
    * while opening a fraction of the files. */
  def readSkipping(spark: SparkSession, path: String,
                   ranges: Seq[ColRange]): DataFrame = {
    require(ranges.nonEmpty, "readSkipping needs at least one range")
    val pred = ranges.map(_.rowPredicate).reduce(_ && _)
    val files = survivingFiles(spark, path, ranges)
    if (files.isEmpty)
      // nothing can match; keep the schema by planning over the full
      // path with a false predicate (parquet stats make this scan-free)
      spark.read.parquet(path).where(lit(false))
    else
      spark.read.parquet(files: _*).filter(pred)
  }
}
