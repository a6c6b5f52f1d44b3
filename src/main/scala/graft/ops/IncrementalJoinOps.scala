package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view — the delta-join rule of classic
  * incremental view maintenance, the join-shaped sibling of
  * [[IncrementalAggOps]]: a 100 TB `A ⋈ B` is joined once, persisted,
  * and kept current under APPEND-ONLY batches by
  *
  *   ΔJ  =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * (A, B are the pre-append states; the three terms partition the new
  * pairs, so J ∪ ΔJ is exactly (A∪ΔA) ⋈ (B∪ΔB) with no dedup pass).
  *
  * All three tables live bucket-partitioned by the join key's hash, so
  * a refresh joins each delta against ONLY the buckets its keys hash
  * into (partition-pruned at listing) and APPENDS — nothing is ever
  * rewritten, and the delta⋈delta term is delta-sized. Cost per
  * refresh ∝ deltas + matching buckets; the rest of A, B and J is
  * never read or written (spec-asserted byte-for-byte).
  *
  * Inner equi-join, append-only sides (retraction of join rows needs
  * multiplicity bookkeeping — out of scope here; use the
  * [[DocStoreOps]] LWW store when rows change in place). Column names
  * besides the key must be disjoint across A and B. Appends accumulate
  * one file per touched bucket per refresh — compact with
  * [[LayoutOps.compact]] on the usual small-files cadence.
  */
object IncrementalJoinOps {

  private val BUCKET = "__bucket"

  private def withBucket(df: DataFrame, key: String, nBuckets: Int): DataFrame =
    df.withColumn(BUCKET, pmod(hash(col(key)), lit(nBuckets)))

  private def writeSide(df: DataFrame, path: String, key: String,
                        nBuckets: Int, mode: SaveMode): Unit =
    withBucket(df, key, nBuckets)
      .write.mode(mode).partitionBy(BUCKET).parquet(path)

  /** Initial build: persists `a`, `b` and their join under `base`. */
  def writeJoinView(a: DataFrame, b: DataFrame, spark: SparkSession,
                    base: String, key: String, nBuckets: Int = 64): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared == Set(key),
      s"sides must share only the join key, got $shared")
    writeSide(a, s"$base/a", key, nBuckets, SaveMode.Overwrite)
    writeSide(b, s"$base/b", key, nBuckets, SaveMode.Overwrite)
    writeSide(a.join(b, key), s"$base/j", key, nBuckets, SaveMode.Overwrite)
    spark.catalog.refreshByPath(s"$base/j")
  }

  /** Fold new rows into both sides and the view. Either delta may be
    * empty. Only buckets the deltas' keys hash into are read; every
    * write is an append. */
  def appendToJoinView(dA: DataFrame, dB: DataFrame, spark: SparkSession,
                       base: String, key: String, nBuckets: Int = 64): Unit = {
    // freeze the deltas: the view append below must not race a source
    // that could re-evaluate differently (and the bucket sets are read
    // twice)
    val dAw = withBucket(dA, key, nBuckets).localCheckpoint(true)
    val dBw = withBucket(dB, key, nBuckets).localCheckpoint(true)
    def buckets(d: DataFrame): Set[Int] =
      d.select(BUCKET).distinct().collect().map(_.getInt(0)).toSet
    val tA = buckets(dAw) // bounded by nBuckets
    val tB = buckets(dBw)
    def readSide(path: String, touched: Set[Int]): DataFrame =
      spark.read.parquet(path)
        .filter(col(BUCKET).isin(touched.toSeq: _*)).drop(BUCKET)
    // pre-append states, pruned to the buckets that can match a delta
    val aAff = readSide(s"$base/a", tB)
    val bAff = readSide(s"$base/b", tA)
    val deltaJ = dAw.drop(BUCKET).join(bAff, key)
      .unionByName(aAff.join(dBw.drop(BUCKET), key))
      .unionByName(dAw.drop(BUCKET).join(dBw.drop(BUCKET), key))
    // ΔJ must materialize BEFORE the side appends land: it reads the
    // pre-append a/ and b/ listings
    writeSide(deltaJ, s"$base/j", key, nBuckets, SaveMode.Append)
    dAw.write.mode(SaveMode.Append).partitionBy(BUCKET).parquet(s"$base/a")
    dBw.write.mode(SaveMode.Append).partitionBy(BUCKET).parquet(s"$base/b")
    Seq("a", "b", "j").foreach(p =>
      spark.catalog.refreshByPath(s"$base/$p"))
    dAw.unpersist(); dBw.unpersist()
  }

  /** The maintained join (all buckets). */
  def readJoinView(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(s"$base/j").drop(BUCKET)

  private def tagsPath(base: String) = s"$base/_stream_tags"

  /** The ledger is a single HIGH-WATER MARK, not a tag set: Structured
    * Streaming batch ids are strictly monotonic per checkpoint and only
    * the last uncommitted batch is ever redelivered, so `tag <= max
    * applied` decides a replay — O(1) state and one tiny parquet read
    * per batch forever, instead of a file-per-batch directory whose
    * listing grows with stream age. Consequence: the ledger is tied to
    * the CHECKPOINT's lifetime — resetting the checkpoint (batch ids
    * restart at 0) requires deleting `_stream_tags` too, exactly like
    * every batchId-keyed foreachBatch dedupe. */
  private def appliedHighWater(spark: SparkSession, base: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(tagsPath(base))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(tagsPath(base))
      .agg(max("tag")).head().getLong(0))
  }

  private def recordHighWater(spark: SparkSession, base: String, tag: Long): Unit = {
    import spark.implicits._
    Seq(tag).toDF("tag").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tagsPath(base))
    spark.catalog.refreshByPath(tagsPath(base))
  }

  /** [[appendToJoinView]] for side A guarded by a batch tag: a tag at
    * or below the recorded high-water mark skips the apply (returns
    * false). The view's appends are multiset — a replayed delta would
    * DOUBLE its join rows (unlike the LWW doc store, where replays
    * re-elect to the same winners) — so the streaming sink below dedups
    * redelivered batches through this ledger.
    *
    * Residual window, stated honestly: the apply itself is THREE
    * appends (j/, a/, b/) and the mark lands after all of them, so a
    * crash anywhere inside or just after the apply leaves some appends
    * committed with no mark, and the redelivery re-appends them —
    * at-least-once across that whole span, not just "between apply and
    * ledger". Closing it needs the vector store's manifest treatment
    * (data invisible until one commit record) applied to all three
    * tables; until then this is the standard foreachBatch-with-batchId
    * contract, which removes the COMMON replay (crash after the
    * checkpoint-visible batch completed) but not the torn-apply one. */
  def appendSideATagged(batch: DataFrame, spark: SparkSession, base: String,
                        key: String, nBuckets: Int, tag: Long): Boolean = {
    if (appliedHighWater(spark, base).exists(tag <= _)) false
    else {
      val emptyB = spark.read.parquet(s"$base/b")
        .drop(BUCKET).filter(lit(false))
      appendToJoinView(batch, emptyB, spark, base, key, nBuckets)
      recordHighWater(spark, base, tag)
      true
    }
  }

  /** Continuous maintenance: fold a STREAMING delta of side A into the
    * view per micro-batch (side-B deltas keep arriving through the
    * batch API — the common fact-stream / dimension-batch shape). Each
    * trigger inherits [[appendToJoinView]]'s bucket locality; redelivered
    * batches are skipped via the batch-id ledger
    * ([[appendSideATagged]]) — without it a replay would double the
    * replayed delta's join rows. */
  def joinViewSinkA(deltaA: DataFrame, base: String, key: String,
                    nBuckets: Int = 64,
                    checkpoint: Option[String] = None) = {
    val w = deltaA.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendSideATagged(batch, batch.sparkSession, base, key,
            nBuckets, batchId): Unit
        }
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Small-files maintenance: every refresh appends one file per
    * touched bucket, so long-lived views accumulate files linearly in
    * refresh count. Rewrite each bucket of the three tables that holds
    * more than `maxFilesPerBucket` files back to one file — bucket
    * layout (and therefore refresh locality) preserved, data unchanged
    * (spec-asserted). Buckets under the threshold keep their files
    * byte-untouched, so compaction cost ∝ fragmented buckets only. */
  def compactJoinView(spark: SparkSession, base: String,
                      maxFilesPerBucket: Int = 4): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("a", "b", "j").foreach { side =>
      val root = new org.apache.hadoop.fs.Path(s"$base/$side")
      val frag = fs.listStatus(root)
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(s"$BUCKET="))
        .filter { d =>
          fs.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet")) > maxFilesPerBucket
        }
        .map(_.getPath.getName.stripPrefix(s"$BUCKET=").toInt)
      if (frag.nonEmpty) {
        val rewritten = spark.read.parquet(s"$base/$side")
          .filter(col(BUCKET).isin(frag.toIndexedSeq: _*))
          .repartition(frag.length, col(BUCKET))
          .localCheckpoint(true) // freeze before overwriting what it reads
        rewritten.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(BUCKET).parquet(s"$base/$side")
        spark.catalog.refreshByPath(s"$base/$side")
      }
    }
  }
}
