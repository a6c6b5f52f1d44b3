package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Output-layout primitives for the write side of a curation pipeline —
  * the part of the 100 TB story that happens AFTER the queries: how the
  * curated corpus lands on disk determines every downstream reader's
  * pruning, join and small-files behavior.
  *
  * The reference's only sink is a BAM rewrite (spark-bam
  * cli/src/main/scala/org/hammerlab/bam/rewrite/Rewrite.scala:30-60, one
  * shard per partition with no layout control); a training-data engine
  * additionally needs the three classic warehouse layouts:
  *
  *  - [[writePartitioned]]: Hive-style `partitionBy` dirs WITHOUT the
  *    small-files explosion. A naive `df.write.partitionBy(c)` makes every
  *    task open a writer for every partition value it sees — `tasks ×
  *    values` files (at 1000 executors × 100 langs that is 3.2 M files per
  *    write, a NameNode outage). Hash-repartitioning on the partition
  *    columns first routes each value to exactly one task → one file per
  *    dir; a deterministic salt widens hot values (e.g. `lang=en` at 40 %
  *    of a corpus) to `filesPerDir` tasks so the biggest dir still writes
  *    in parallel and no single task owns 40 % of the data.
  *  - [[writeBucketed]]: `bucketBy` tables on the join key. Two tables
  *    bucketed the same way join with ZERO Exchange on read-back —
  *    at 100 TB the shuffle this removes (both sides of every
  *    orders⋈lineitem-shaped join, every re-run of a dedup pass against
  *    yesterday's corpus) is the single largest cost in the pipeline.
  *    Pre-partitioning by the bucket expression writes exactly one file
  *    per bucket, which also lets Spark use the `sortBy` metadata and skip
  *    the read-back sort.
  *  - [[compact]]: bin-pack a directory of shard files to a target file
  *    size. Streaming sinks and incremental appends accrete small files;
  *    readers pay per-file open cost and lose row-group locality. Sizing
  *    from the ACTUAL byte size on disk (not a guessed row count) keeps the
  *    result stable as the corpus grows.
  *
  * All three are single narrow-shuffle (or shuffle-free) jobs: nothing
  * here collects to the driver or depends on partition count staying
  * small.
  */
object LayoutOps {

  /** Write `df` Hive-partitioned by `partCols`, sorted by `sortCols`
    * within each file (parquet row-group min/max stats make read-back
    * range filters on those columns prune inside the file too).
    *
    * `filesPerDir` bounds BOTH the files written per partition dir and the
    * fraction of data a single task owns: rows are shuffled on
    * `partCols + xxhash64(distCol) % filesPerDir`, so a skewed partition
    * value fans out to `filesPerDir` writers instead of serializing on
    * one. The salt is a pure function of `distCol` — the layout is
    * deterministic and rerun-stable, never `rand()`.
    *
    * `numTasks` is the route-key hash space: two route keys (a partition
    * value × salt lane) that collide modulo the task count merge back into
    * one writer/file, so leave it well above `distinct partCols ×
    * filesPerDir` (0 = the session's `spark.sql.shuffle.partitions`).
    * Collisions only cost write parallelism, never correctness — files
    * per dir stays ≤ `filesPerDir`.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      sortCols: Seq[String],
      filesPerDir: Int = 1,
      distCol: Option[String] = None,
      numTasks: Int = 0): Unit = {
    require(partCols.nonEmpty, "writePartitioned needs partition columns")
    // the fan-out only exists through the salt: accepting filesPerDir > 1
    // without a distCol would silently serialize each hot partition value
    // on one task — the exact skew the parameter promises to break
    require(filesPerDir <= 1 || distCol.nonEmpty,
      s"filesPerDir=$filesPerDir needs distCol: the fan-out salt is " +
        "derived from it (without one each partition value writes on a " +
        "single task)")
    val salt = distCol
      .filter(_ => filesPerDir > 1)
      .map(c => pmod(xxhash64(col(c)), lit(filesPerDir)))
    val routeKeys = partCols.map(col) ++ salt.toSeq
    val routed =
      if (numTasks > 0) df.repartition(numTasks, routeKeys: _*)
      else df.repartition(routeKeys: _*)
    routed
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Write `df` as a bucketed table (external, at `path`) bucketed and
    * sorted by `keyCol`. Pre-partitioning with `repartition(nBuckets,
    * keyCol)` uses the SAME Murmur3 `pmod(hash(key), n)` routing as the
    * bucket-id computation, so each task holds exactly one bucket → one
    * file per bucket — the layout Spark requires before it will trust the
    * `sortBy` metadata and drop the read-back sort as well as the
    * Exchange. */
  def writeBucketed(
      df: DataFrame,
      spark: SparkSession,
      table: String,
      path: String,
      nBuckets: Int,
      keyCols: String*): Unit = {
    require(keyCols.nonEmpty, "writeBucketed needs bucket key columns")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, keyCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)
  }

  /** Append into an existing bucketed table, preserving its bucket
    * routing (the write re-states the table's own bucket spec — Spark
    * rejects a mismatched one, so an append can never silently break the
    * Exchange-free join property). Each append adds one file per
    * non-empty bucket; compact by rewriting through [[writeBucketed]]
    * when the per-bucket file count grows. */
  def appendBucketed(
      df: DataFrame,
      spark: SparkSession,
      table: String): Unit = {
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
      .getOrElse(throw new IllegalArgumentException(
        s"$table is not a bucketed table"))
    val keyCols = spec.bucketColumnNames
    val writer = df.repartition(spec.numBuckets, keyCols.map(col): _*)
      .write
      .mode(SaveMode.Append)
      .bucketBy(spec.numBuckets, keyCols.head, keyCols.tail: _*)
    // a bucketed table without sort columns is legal (bucketBy alone) —
    // append must mirror whatever the table declares, not assume a sort
    val sorted = spec.sortColumnNames match {
      case h +: t => writer.sortBy(h, t: _*)
      case _ => writer
    }
    sorted.saveAsTable(table)
    // the table's file listing is cached from its first read; without an
    // explicit refresh a reader that already scanned the table keeps
    // planning against the pre-append listing and silently misses the
    // appended rows
    spark.catalog.refreshTable(table)
  }

  /** Morton (Z-order) value: interleave the low `bits` bits of `x` and
    * `y` (x on even bit positions, y on odd). Built as a flat sum of
    * shift/mask terms — a single codegen'd arithmetic expression, no UDF.
    * Inputs must be non-negative integral columns already reduced to the
    * `bits`-bit grid (e.g. `col % 256` for bits=8). */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             bits: Int = 8): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Z-order-cluster `df` on two dimension columns and write it as
    * `numFiles` range-partitioned parquet files, each internally sorted by
    * the Z-value (kept as column `zCol`).
    *
    * Why this layout: range-partitioning on a 1-D sort key gives perfect
    * pruning on THAT key and none on any other; interleaving two keys'
    * bits makes Z-contiguous file ranges map to small rectangles in
    * (x, y) space, so parquet footer min/max stats on BOTH columns stay
    * tight per file and a 2-D box predicate skips most files — the
    * standard multi-dimensional data-skipping layout (Delta/Iceberg
    * `OPTIMIZE ZORDER BY`) expressed as plain Spark: one
    * `repartitionByRange` shuffle + an in-partition sort, scale-free. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column,
      numFiles: Int,
      bits: Int = 8,
      zCol: String = "z"): Unit =
    df.withColumn(zCol, zValue(xCol, yCol, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Rewrite the parquet files under `inPath` into `outPath` as
    * ~`targetFileBytes`-sized files. File count derives from the actual
    * on-disk byte size (Hadoop `getContentSummary`), so the same call
    * stays correct from MB fixtures to TB corpora; `coalesce` (not
    * `repartition`) keeps the rewrite shuffle-free. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
